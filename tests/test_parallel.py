"""Multi-chip layer on the virtual 8-device CPU mesh: sharded == single-device."""

import jax
import jax.numpy as jnp
import numpy as np

from sks_tpu.parallel import make_mesh
from sks_tpu.parallel.sharded_ba import shard_problem, sharded_gauss_newton_step
from sks_tpu.slam.ba import gauss_newton_step, rms_reprojection


def test_make_mesh_shapes():
    mesh = make_mesh({"hyp": 8})
    assert mesh.shape == {"hyp": 8}
    mesh2 = make_mesh({"dp": 2, "mp": -1})
    assert mesh2.shape == {"dp": 2, "mp": 4}


def test_sharded_ba_matches_single_device(key):
    from test_slam import _ba_setup

    gt, prob = _ba_setup(key)
    # Pad landmarks to a multiple of 8 for even sharding.
    l = prob.points.shape[0]
    pad = (-l) % 8
    if pad:
        from sks_tpu.slam.ba import BAProblem

        prob = BAProblem(
            poses=prob.poses,
            points=jnp.concatenate(
                [prob.points, jnp.ones((pad, 3), prob.points.dtype)], 0
            ),
            intrinsics=prob.intrinsics,
            obs=jnp.concatenate(
                [prob.obs, jnp.zeros((prob.obs.shape[0], pad, 2), prob.obs.dtype)], 1
            ),
            mask=jnp.concatenate(
                [prob.mask, jnp.zeros((prob.mask.shape[0], pad), prob.mask.dtype)], 1
            ),
        )

    mesh = make_mesh({"lm": 8})
    single = gauss_newton_step(prob, damping=1e-6)
    sharded = sharded_gauss_newton_step(mesh, shard_problem(prob, mesh), 1e-6)
    assert np.allclose(
        np.asarray(single.poses), np.asarray(sharded.poses), atol=1e-8
    )
    assert np.allclose(
        np.asarray(single.points), np.asarray(sharded.points), atol=1e-8
    )


def test_sharded_ba_converges(key):
    from test_slam import _ba_setup
    from sks_tpu.slam.ba import BAProblem

    gt, prob = _ba_setup(key)
    l = prob.points.shape[0]
    pad = (-l) % 8
    prob = BAProblem(
        poses=prob.poses,
        points=jnp.concatenate([prob.points, jnp.ones((pad, 3), prob.points.dtype)], 0),
        intrinsics=prob.intrinsics,
        obs=jnp.concatenate(
            [prob.obs, jnp.zeros((prob.obs.shape[0], pad, 2), prob.obs.dtype)], 1
        ),
        mask=jnp.concatenate(
            [prob.mask, jnp.zeros((prob.mask.shape[0], pad), prob.mask.dtype)], 1
        ),
    )
    mesh = make_mesh({"lm": 8})
    prob = shard_problem(prob, mesh)
    for _ in range(6):
        prob = sharded_gauss_newton_step(mesh, prob, damping=1e-6)
    assert float(rms_reprojection(prob)) < 1e-6
