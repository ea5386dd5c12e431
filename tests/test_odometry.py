"""Planar VO: synthetic trajectory over a plane, ATE must be small."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sks_tpu.geom.homography import apply_homography, homography_from_pose
from sks_tpu.robust.ransac import RansacConfig
from sks_tpu.slam.odometry import chain_poses, vo_trajectory
from sks_tpu.slam.posegraph import ate_rmse
from sks_tpu.utils.synth import random_rotation

T_FRAMES = 8
N_PTS = 128


def _sequence(key, dtype=jnp.float64):
    """Ground-truth camera track above the z = d plane + per-pair matches."""
    k_mat = jnp.array(
        [[600.0, 0.0, 320.0], [0.0, 600.0, 240.0], [0.0, 0.0, 1.0]], dtype
    )
    kr, kt, kp = jax.random.split(key, 3)
    d0 = 3.0
    # Relative motions: small rotations + translations (mostly lateral).
    rels_r = random_rotation(kr, (T_FRAMES - 1,), 0.05, dtype)
    rels_t = jax.random.uniform(kt, (T_FRAMES - 1, 3), dtype, -0.15, 0.15)

    # Absolute camera poses (cam->world), world = cam0.
    def to_se3(r, t):
        top = jnp.concatenate([r, t[..., None]], axis=-1)
        bot = jnp.broadcast_to(jnp.asarray([0, 0, 0, 1], dtype), (*top.shape[:-2], 1, 4))
        return jnp.concatenate([top, bot], axis=-2)

    rel = to_se3(rels_r, rels_t)  # X_{i+1} = rel_i X_i
    poses_gt = chain_poses(rel)

    # Plane depth per frame + homographies between consecutive frames.
    n0 = jnp.asarray([0.0, 0.0, 1.0], dtype)
    pts1_list, pts2_list = [], []
    n_i, d_i = n0, d0
    for i in range(T_FRAMES - 1):
        r_i, t_i = rels_r[i], rels_t[i]
        h_i = homography_from_pose(
            k_mat, k_mat, r_i, t_i, n_i, jnp.asarray(d_i)
        )
        p1 = jax.random.uniform(
            jax.random.fold_in(kp, i), (N_PTS, 2), dtype, 160.0, 480.0
        )
        pts1_list.append(p1)
        pts2_list.append(apply_homography(h_i, p1))
        n_i = r_i @ n_i
        d_i = d_i + jnp.dot(n_i, t_i)
    return (
        k_mat,
        jnp.stack(pts1_list),
        jnp.stack(pts2_list),
        poses_gt,
        d0,
    )


def test_vo_recovers_trajectory(key):
    k_mat, pts1, pts2, poses_gt, d0 = _sequence(key)
    config = RansacConfig(num_hypotheses=512, threshold=2.0, refine_iters=1)
    out = vo_trajectory(
        key, pts1, pts2, k_mat, config, plane_depth=d0, smooth=False
    )
    ate = float(ate_rmse(out["poses"], poses_gt))
    # Noise-free matches; error comes only from solver numerics and the
    # two-fold decomposition ambiguity (resolved by cheirality here).
    assert ate < 0.02, ate
    assert int(jnp.min(out["num_inliers"])) > N_PTS * 0.9


@pytest.mark.slow
def test_vo_smoothing_runs(key):
    k_mat, pts1, pts2, poses_gt, d0 = _sequence(key)
    config = RansacConfig(num_hypotheses=256, threshold=2.0, refine_iters=0)
    out = vo_trajectory(
        key, pts1, pts2, k_mat, config, plane_depth=d0, smooth=True
    )
    assert out["poses"].shape == (T_FRAMES, 4, 4)
    assert bool(jnp.all(jnp.isfinite(out["poses"])))


@pytest.mark.slow
def test_loop_closures_reduce_ate(key):
    """Smoothing with genuine loop-closure edges beats odometry-only ATE.

    Uses the rendered closed-circuit sequence (images.planar_sequence
    loop=True) end-to-end: detection, matching (consecutive AND i<->i+k
    candidate pairs), RANSAC, closure-edge pose graph.  Smoothing WITHOUT
    closures cannot improve a chain-consistent graph; with closures it must.
    Committed artifact: bench_results/LOOP_CLOSURE.json.
    """
    from sks_tpu.bench.real_pipeline import loop_closure_ate

    out = loop_closure_ate(0, num_frames=12, strides=(4, 6))
    assert np.isfinite(out["ate_smooth_with_closures"])
    # The round-4 front end (sub-pixel corners + gradient orientation) cut
    # raw odometry ATE ~2x, so closures have less drift left to correct:
    # the contract is a strict improvement, not a fixed-factor one.
    assert out["ate_smooth_with_closures"] < 0.95 * out["ate_odometry"], out
