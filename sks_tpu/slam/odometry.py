"""Planar visual odometry: homography chain -> pose trajectory (batched).

The BASELINE.json VO config ("homography-chain pose recovery + pose-graph
optimization, ATE within reference bound"): for each consecutive frame pair,
fit a homography by vectorized RANSAC (vmapped over all pairs at once — the
whole sequence is one jit), decompose to relative pose with a known plane
depth fixing the monocular scale, chain, and optionally relax with the pose
graph.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array

from sks_tpu.geom.pose import recover_pose
from sks_tpu.robust.ransac import RansacConfig, ransac_homography
from sks_tpu.slam.posegraph import PoseGraph, optimize_posegraph

__all__ = ["vo_trajectory", "chain_poses", "closure_candidates",
           "fit_pair", "chain_metric", "assemble_trajectory"]


def fit_pair(key, p1, p2, pm, k_mat, config, plane_normal,
             f1=None, f2=None, esm_iters: int = 0):
    """RANSAC homography + pose recovery for one frame pair.

    With ``esm_iters > 0`` and the frame pair ``(f1, f2)`` supplied, the
    RANSAC model is densely polished by photometric alignment
    (:func:`sks_tpu.slam.tracking.esm_polish_pair`) before pose recovery —
    every overlap pixel votes, so corner localization error stops capping
    accuracy.  A geometry guard re-scores both models on the matches and
    keeps the better (a photometric win can be a geometric loss off-plane).

    Returns (R, t/d, n, num_inliers) — the per-pair unit the VO chain, the
    loop-closure edges, and the frame-sharded pipeline all share.
    """
    res = ransac_homography(key, p1, p2, config, point_mask=pm)
    h, ninl = res.h, res.num_inliers
    if esm_iters and f1 is not None:
        from sks_tpu.robust.ransac import score_hypotheses
        from sks_tpu.slam.tracking import (
            esm_guard,
            esm_polish_pair_symmetric,
        )

        # Round 5: symmetric full-frame polish — the configuration under
        # which every bundled photo texture's VO beats feature-only
        # (see esm_polish_pair_symmetric; the half-frame one-direction
        # polish regressed china through the guard).
        h_esm, _ = esm_polish_pair_symmetric(f1, f2, h, iters=esm_iters)
        ok = esm_guard(h, h_esm, p1, p2, res.inlier_mask)
        cand = jnp.stack([h, h_esm])
        _, inl = score_hypotheses(
            cand, p1, p2, config.threshold, pm, config.scoring,
            config.sigma_max, config.df64_scoring,
        )
        h = jnp.where(ok, h_esm, h)
        ninl = jnp.sum(jnp.where(ok, inl[1], inl[0])).astype(jnp.int32)
    r, t, n, _ = recover_pose(
        h, k_mat, k_mat, p1, p2, normal_prior=plane_normal
    )
    return r, t, n, ninl


def chain_metric(r, t_over_d, n, plane_depth):
    """Chain per-pair (R, t/d, n) into metric relative poses + world poses.

    The homography yields t/d with d the *current* plane depth; track d
    along the chain: in cam_{i+1} coords the plane is (R n).X = d + (R n).t,
    so d_{i+1} = d_i + n_{i+1}.t_i.  Returns (rel (T-1,4,4), poses (T,4,4),
    depths (T,)).
    """
    def scale_step(d, rtn):
        r_i, tt_i, n_i = rtn
        t_i = tt_i * d
        n_new = r_i @ n_i
        d_new = d + jnp.dot(n_new, t_i)
        return d_new, (t_i, d)

    d0 = jnp.asarray(plane_depth, r.dtype)
    d_last, (t_metric, d_at) = jax.lax.scan(scale_step, d0, (r, t_over_d, n))
    rel = _rt_to_se3(r, t_metric)
    poses = chain_poses(rel)
    depths = jnp.concatenate([d_at, d_last[None]])
    return rel, poses, depths


def closure_candidates(num_frames: int, strides=(4, 8)) -> list:
    """Non-consecutive frame pairs (i, i+k) to test for loop closures.

    The VO chain only ever constrains consecutive frames; pose-graph
    relaxation needs frame-i <-> frame-i+k constraints to correct drift —
    the mechanism the pose graph exists for.  Returns [(i, j), ...] with
    j - i in ``strides`` (static Python, trace-time)."""
    out = []
    for k in strides:
        out.extend((i, i + k) for i in range(0, num_frames - k))
    return out


def _rt_to_se3(r: Array, t: Array) -> Array:
    top = jnp.concatenate([r, t[..., None]], axis=-1)
    bot = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], r.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bot], axis=-2)


def _inv_se3(g: Array) -> Array:
    r = g[..., :3, :3]
    t = g[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", rt, t)
    top = jnp.concatenate([rt, ti[..., None]], axis=-1)
    bot = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], g.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bot], axis=-2)


def chain_poses(rel: Array) -> Array:
    """Chain T-1 relative cam_i->cam_{i+1} transforms into T world poses.

    rel: (T-1, 4, 4) with X_{i+1} = rel_i X_i.  Returns (T, 4, 4) cam->world
    poses, first = identity.  Uses an associative scan (log-depth on device).
    """
    inv_rel = _inv_se3(rel)  # cam_{i+1} -> cam_i
    from sks_tpu.geom.lie import mm_small

    chained = jax.lax.associative_scan(mm_small, inv_rel)
    eye = jnp.eye(4, dtype=rel.dtype)[None]
    return jnp.concatenate([eye, chained], axis=0)


@partial(jax.jit, static_argnames=("config", "smooth", "plane_depth",
                                   "esm_iters"))
def vo_trajectory(
    key: Array,
    pts1: Array,
    pts2: Array,
    k_mat: Array,
    config: RansacConfig = RansacConfig(num_hypotheses=1024),
    plane_depth: float = 1.0,
    smooth: bool = False,
    plane_normal: Array | None = None,
    point_mask: Array | None = None,
    closure_pairs: Array | None = None,
    closure_pts1: Array | None = None,
    closure_pts2: Array | None = None,
    closure_mask: Array | None = None,
    frames: Array | None = None,
    esm_iters: int = 0,
):
    """Trajectory from per-pair correspondences.

    Args:
      key: PRNG key (folded per pair).
      pts1, pts2: (T-1, N, 2) matched pixels for consecutive pairs.
      k_mat: (3, 3) intrinsics.
      plane_depth: metric distance of the plane from camera 0 (fixes scale).
      smooth: run pose-graph relaxation over the chained trajectory.
      plane_normal: approximate plane normal in the camera frame (default
        frontal, (0,0,1)) — resolves the homography twofold ambiguity.
      point_mask: optional (T-1, N) validity for padded fixed-shape match
        arrays (what a real matcher emits) — masked points never score.
      closure_pairs: optional (E, 2) int32 non-consecutive frame pairs
        (i, j), i < j (see :func:`closure_candidates`); with
        ``closure_pts1/pts2`` ((E, M, 2) matches between those frames) each
        pair is fitted like a consecutive pair and added as a pose-graph
        loop-closure edge when ``smooth=True`` — genuine drift-correcting
        constraints, not just the odometry chain re-weighted.
      frames: optional (T, H, W) grayscale frames; with ``esm_iters > 0``
        every pair fit (consecutive AND closure) is densely ESM-polished
        against the pixels before pose recovery (see :func:`fit_pair`).
      esm_iters: static ESM iteration count (0 disables the dense polish).

    Returns:
      dict: poses (T, 4, 4) cam->world, rel (T-1, 4, 4), num_inliers (T-1,),
      and (with closures) closure_inliers (E,).
    """
    from sks_tpu.utils.rng import CLOSURE_STREAM_OFFSET, fold_in_stream

    t_minus_1 = pts1.shape[0]
    assert t_minus_1 < CLOSURE_STREAM_OFFSET, (
        "consecutive-pair RNG stream would collide with the closure stream"
    )
    keys = fold_in_stream(key, t_minus_1)
    if plane_normal is None:
        plane_normal = jnp.asarray([0.0, 0.0, 1.0], pts1.dtype)

    use_esm = esm_iters > 0 and frames is not None

    def fit_one(k, p1, p2, pm, f1=None, f2=None):
        return fit_pair(k, p1, p2, pm, k_mat, config, plane_normal,
                        f1, f2, esm_iters if use_esm else 0)

    pm = (jnp.ones(pts1.shape[:-1], bool) if point_mask is None
          else point_mask)
    if use_esm:
        r, t_over_d, n, ninl = jax.vmap(fit_one)(
            keys, pts1, pts2, pm, frames[:-1], frames[1:]
        )
    else:
        r, t_over_d, n, ninl = jax.vmap(fit_one)(keys, pts1, pts2, pm)

    closure = None
    if closure_pairs is not None:
        cp = jnp.asarray(closure_pairs, jnp.int32)
        ckeys = fold_in_stream(key, cp.shape[0],
                               offset=CLOSURE_STREAM_OFFSET)
        cm = (jnp.ones(closure_pts1.shape[:-1], bool) if closure_mask is None
              else closure_mask)
        if use_esm:
            r_c, tt_c, n_c, ninl_c = jax.vmap(fit_one)(
                ckeys, closure_pts1, closure_pts2, cm,
                frames[cp[:, 0]], frames[cp[:, 1]]
            )
        else:
            r_c, tt_c, n_c, ninl_c = jax.vmap(fit_one)(
                ckeys, closure_pts1, closure_pts2, cm
            )
        closure = (r_c, tt_c, ninl_c, cp)

    return assemble_trajectory(r, t_over_d, n, ninl, plane_depth, smooth,
                               closure=closure)


def assemble_trajectory(r, t_over_d, n, ninl, plane_depth: float,
                        smooth: bool, closure=None):
    """Per-pair (R, t/d, n, inliers) -> chained (+ optionally relaxed) poses.

    The shared back half of :func:`vo_trajectory` and the frame-sharded
    capstone (``slam.pipeline.sharded_planar_slam``): metric chain, closure
    scaling by the plane depth at each closure's source frame, and pose-graph
    relaxation over odometry + inlier-gated closure edges.

    Args:
      closure: optional ``(r_c, tt_c, ninl_c, cp)`` — closure-pair rotations,
        t/d vectors, inlier counts, and (E, 2) int32 frame pairs.
    """
    t_minus_1 = r.shape[0]
    rel, poses, depths = chain_metric(r, t_over_d, n, plane_depth)
    out = {"poses": poses, "rel": rel, "num_inliers": ninl}

    rel_c = None
    if closure is not None:
        r_c, tt_c, ninl_c, cp = closure
        # Scale each closure by the plane depth at its source frame i.
        t_c = tt_c * depths[cp[:, 0]][:, None]
        rel_c = _rt_to_se3(r_c, t_c)  # cam_i -> cam_j
        out["closure_inliers"] = ninl_c

    if smooth:
        edges = jnp.stack(
            [jnp.arange(t_minus_1), jnp.arange(1, t_minus_1 + 1)], axis=-1
        ).astype(jnp.int32)
        meas = _inv_se3(rel)
        weights = jnp.asarray(ninl, poses.dtype)
        if rel_c is not None:
            edges = jnp.concatenate([edges, cp], axis=0)
            meas = jnp.concatenate([meas, _inv_se3(rel_c)], axis=0)
            # A closure with too few inliers is a misfit, not a constraint.
            w_c = jnp.where(ninl_c >= 12, ninl_c, 0).astype(poses.dtype)
            weights = jnp.concatenate([weights, w_c], axis=0)
        graph = PoseGraph(poses=poses, edges=edges, meas=meas,
                          weights=weights)
        poses = optimize_posegraph(graph, gn_iters=5, cg_iters=30).poses
        out["poses"] = poses

    return out
