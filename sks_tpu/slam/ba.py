"""Bundle adjustment with Schur-complement reduction (batched, shardable).

The SfM refinement layer (BASELINE.json configs; no reference counterpart).
Problem: K camera poses (SE(3) tangent increments), L 3-D landmarks, masked
observations (K, L, 2).  Gauss-Newton with the classic two-block structure:

    [ B   E ] [dx_c]   [ v ]          B: (K, 6, 6) camera blocks
    [ E^T C ] [dx_p] = [ w ]          C: (L, 3, 3) landmark blocks (block-diag)

Landmarks are eliminated in closed form (3x3 inverses), leaving the Schur
system ``S dx_c = v - E C^{-1} w`` with ``S = B - E C^{-1} E^T`` — dense
(6K, 6K), tiny for keyframe windows, solved on-device.

Distribution (the "distributed Schur-complement BA over psum" design,
SURVEY.md §2.6/§7): shard landmarks across the mesh; every term of S, v, w is
a sum over landmarks, so each device reduces its shard and one ``psum``
assembles the global Schur system; the back-substitution for dx_p is local to
each landmark shard.  See ``sks_tpu/parallel/sharded_ba.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import Array

from sks_tpu.geom.lie import se3_exp

__all__ = ["BAProblem", "ba_residuals", "build_normal_blocks",
           "schur_reduce_solve", "gauss_newton_step", "run_ba"]


@jax.tree_util.register_pytree_node_class
@dataclass
class BAProblem:
    """Fixed-shape BA problem.

    poses: (K, 4, 4) world->camera transforms.
    points: (L, 3) world landmarks.
    intrinsics: (3, 3) shared K matrix.
    obs: (K, L, 2) observed pixels.
    mask: (K, L) observation validity (0/1 float).
    """

    poses: Array
    points: Array
    intrinsics: Array
    obs: Array
    mask: Array

    def tree_flatten(self):
        return (self.poses, self.points, self.intrinsics, self.obs, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, c):
        return cls(*c)


def _project(pose: Array, point: Array, k: Array) -> Array:
    """World point -> pixel under pose (4,4) and intrinsics (3,3)."""
    pc = pose[..., :3, :3] @ point[..., None] + pose[..., :3, 3:4]
    pc = pc[..., 0]
    uv = (k @ pc[..., None])[..., 0]
    return uv[..., :2] / uv[..., 2:3]


def ba_residuals(problem: BAProblem, dx_c: Array | None = None,
                 dx_p: Array | None = None) -> Array:
    """Masked reprojection residuals (K, L, 2).

    dx_c (K, 6) / dx_p (L, 3) are optional local increments (right-perturbed
    poses, additive points) — the linearization variables for GN.
    """
    poses = problem.poses
    if dx_c is not None:
        poses = poses @ se3_exp(dx_c)
    points = problem.points if dx_p is None else problem.points + dx_p
    uv = _project(
        poses[:, None], points[None, :], problem.intrinsics
    )  # (K, L, 2)
    return (uv - problem.obs) * problem.mask[..., None]


def build_normal_blocks(problem: BAProblem):
    """Per-observation Jacobians -> GN blocks (B, E, C, v, w).

    Jacobians come from jax.jacfwd of the per-observation residual in the
    local increment — no hand-derived projection derivatives to maintain.
    """
    k_mat = problem.intrinsics

    def res_one(pose, point, obs, dc, dp):
        uv = _project(pose @ se3_exp(dc), point + dp, k_mat)
        return uv - obs

    zero6 = jnp.zeros((6,), problem.poses.dtype)
    zero3 = jnp.zeros((3,), problem.poses.dtype)

    def jac_one(pose, point, obs):
        jc = jax.jacfwd(lambda d: res_one(pose, point, obs, d, zero3))(zero6)
        jp = jax.jacfwd(lambda d: res_one(pose, point, obs, zero6, d))(zero3)
        r = res_one(pose, point, obs, zero6, zero3)
        return jc, jp, r

    jac = jax.vmap(jax.vmap(jac_one, in_axes=(None, 0, 0)), in_axes=(0, None, 0))
    jc, jp, r = jac(problem.poses, problem.points, problem.obs)  # (K,L,2,6/3), (K,L,2)
    m = problem.mask[..., None, None]
    jc = jc * m
    jp = jp * m
    r = r * problem.mask[..., None]

    b = jnp.einsum("klri,klrj->kij", jc, jc)  # (K, 6, 6)
    c = jnp.einsum("klri,klrj->lij", jp, jp)  # (L, 3, 3)
    e = jnp.einsum("klri,klrj->klij", jc, jp)  # (K, L, 6, 3)
    v = -jnp.einsum("klri,klr->ki", jc, r)  # (K, 6)
    w = -jnp.einsum("klri,klr->li", jp, r)  # (L, 3)
    return b, e, c, v, w


def schur_reduce_solve(b, e, c, v, w, damping: float = 1e-6):
    """Eliminate landmarks, solve the Schur system, back-substitute.

    Returns (dx_c (K, 6), dx_p (L, 3)).
    """
    kk, ll = e.shape[0], e.shape[1]
    dtype = b.dtype
    c = c + damping * jnp.eye(3, dtype=dtype)
    c_inv = jnp.linalg.inv(c)  # (L, 3, 3) block-diagonal closed form

    ec = jnp.einsum("klij,ljm->klim", e, c_inv)  # (K, L, 6, 3)
    s_off = jnp.einsum("klim,qljm->kqij", ec, e)  # (K, K, 6, 6)
    s = -s_off
    s = s.at[jnp.arange(kk), jnp.arange(kk)].add(b + damping * jnp.eye(6, dtype=dtype))
    rhs = v - jnp.einsum("klim,lm->ki", ec, w)  # (K, 6)

    s_dense = s.transpose(0, 2, 1, 3).reshape(kk * 6, kk * 6)
    dx_c = jnp.linalg.solve(s_dense, rhs.reshape(kk * 6)).reshape(kk, 6)

    # Back-substitute: dx_p = C^{-1} (w - E^T dx_c).
    et_dx = jnp.einsum("klij,ki->lj", e, dx_c)
    dx_p = jnp.einsum("lij,lj->li", c_inv, w - et_dx)
    return dx_c, dx_p


@partial(jax.jit, static_argnames=("fix_first",))
def gauss_newton_step(problem: BAProblem, damping: float = 1e-6,
                      fix_first: bool = True) -> BAProblem:
    """One GN/LM step: linearize, Schur-solve, retract.

    fix_first gauges the problem by freezing camera 0 (removes the 6-DOF
    gauge freedom; scale is fixed by the landmarks).
    """
    b, e, c, v, w = build_normal_blocks(problem)
    if fix_first:
        big = jnp.asarray(1e12, b.dtype)
        b = b.at[0].add(big * jnp.eye(6, dtype=b.dtype))
    dx_c, dx_p = schur_reduce_solve(b, e, c, v, w, damping)
    return BAProblem(
        poses=problem.poses @ se3_exp(dx_c),
        points=problem.points + dx_p,
        intrinsics=problem.intrinsics,
        obs=problem.obs,
        mask=problem.mask,
    )


def run_ba(problem: BAProblem, iters: int = 5, damping: float = 1e-6) -> BAProblem:
    """Fixed-iteration Gauss-Newton BA (jit-friendly)."""
    for _ in range(iters):
        problem = gauss_newton_step(problem, damping)
    return problem


def rms_reprojection(problem: BAProblem) -> Array:
    r = ba_residuals(problem)
    n = jnp.maximum(problem.mask.sum(), 1.0)
    return jnp.sqrt(jnp.sum(r * r) / (2 * n))


def synth_ba_problem(
    key: Array,
    num_cams: int = 20,
    num_points: int = 10_240,
    noise_pose: float = 0.02,
    noise_pt: float = 0.05,
    noise_px: float = 0.5,
    visibility: float = 0.8,
    dtype=jnp.float32,
):
    """Synthetic BA problem at arbitrary scale: (ground_truth, noisy_init).

    Cameras on a gentle arc viewing a thick planar cloud around z=4; each
    observation is the exact projection plus ``noise_px`` pixels; a random
    ``visibility`` fraction of (cam, point) pairs is observed.  The noisy
    init perturbs poses and points — the quantity BA must undo.
    """
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    k_mat = jnp.array(
        [[600.0, 0.0, 320.0], [0.0, 600.0, 240.0], [0.0, 0.0, 1.0]], dtype
    )
    xi = jax.random.normal(k1, (num_cams, 6), dtype) * 0.1
    poses_gt = se3_exp(xi)
    pts = jnp.concatenate(
        [
            jax.random.uniform(k2, (num_points, 2), dtype, -1.5, 1.5),
            4.0 + 0.2 * jax.random.normal(k3, (num_points, 1), dtype),
        ],
        axis=-1,
    )
    mask = (jax.random.uniform(k7, (num_cams, num_points), dtype)
            < visibility).astype(dtype)
    gt = BAProblem(
        poses=poses_gt, points=pts, intrinsics=k_mat,
        obs=jnp.zeros((num_cams, num_points, 2), dtype), mask=mask,
    )
    obs = ba_residuals(gt)  # == projections (obs is zero above)
    obs = obs + noise_px * jax.random.normal(k6, obs.shape, dtype)
    gt = BAProblem(poses_gt, pts, k_mat, obs, mask)

    poses0 = poses_gt @ se3_exp(
        jax.random.normal(k4, (num_cams, 6), dtype) * noise_pose
    )
    pts0 = pts + noise_pt * jax.random.normal(k5, pts.shape, dtype)
    init = BAProblem(poses0, pts0, k_mat, obs, mask)
    return gt, init
