"""cv2-style convenience API over the vectorized RANSAC stack.

Migration surface for users of ``cv2.findHomography`` /
``getPerspectiveTransform`` (which the reference's baselines are adapted
from): same call shape, same ``(H, mask)`` return, JAX arrays in and out, one
fixed-shape jit under the hood.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from sks_tpu.robust.ransac import (
    RansacConfig,
    ransac_homography,
    ransac_homography_adaptive,
    ransac_homography_fused,
)

__all__ = [
    "find_homography",
    "get_perspective_transform",
    "get_affine_transform",
]

_METHODS = ("ransac", "msac", "magsac", "lmeds", "fused")


def find_homography(
    src: Array,
    tar: Array,
    method: str = "ransac",
    ransac_reproj_threshold: float = 3.0,
    max_iters: int = 2048,
    solver: str = "aca",
    key: Array | None = None,
    refine_iters: int = 2,
    confidence: float | None = None,
    sampling: str = "uniform",
):
    """Robustly fit H mapping src -> tar (the ``cv2.findHomography`` shape).

    Args:
      src, tar: (N, 2) matched points, N >= 4.
      method: 'ransac' (inlier counting), 'msac', 'magsac' (sigma-marginalized
        scoring), 'lmeds' (threshold-free least-median), or 'fused' (Pallas
        fused solve+score hot path, TPU).
      ransac_reproj_threshold: inlier threshold in pixels (symmetric
        transfer error, like cv2's default semantic).
      max_iters: hypothesis budget.  Without ``confidence`` all hypotheses
        are evaluated at once (fixed shape, no early exit to tune; rounded up
        to a multiple of 128 for 'fused').  With ``confidence`` it is the
        worst-case cap of the early-exit loop.
      solver: minimal solver for hypotheses ('aca', 'sks', 'rho_ge', ...).
      key: PRNG key (default: PRNGKey(0) — deterministic).
      refine_iters: IRLS local-optimization rounds on the consensus set.
      confidence: if set (e.g. 0.995, the cv2 default semantic), run the
        early-exit loop (:func:`ransac_homography_adaptive`): chunks of 256
        hypotheses until the termination bound is met or ``max_iters`` total.
        Not supported with method='fused'.
      sampling: 'uniform', or 'prosac' progressive sampling (src/tar must be
        sorted by descending match quality). Not supported with
        method='fused'.

    Returns:
      (H (3, 3) jnp array normalized to H[2,2]=1, mask (N,) bool inliers).
    """
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}, got {method!r}")
    if key is None:
        key = jax.random.PRNGKey(0)
    src = jnp.asarray(src)
    tar = jnp.asarray(tar)

    if method == "fused" and confidence is not None:
        raise ValueError("confidence-based early exit is not supported with "
                         "method='fused' (fixed-batch Pallas path)")
    if method == "fused" and sampling != "uniform":
        raise ValueError("method='fused' supports only uniform sampling")

    # On TPU the fused Pallas kernel IS the production path: route eligible
    # configurations through it automatically (identical semantics to the
    # general path with solver='aca', modulo hypothesis-sampling RNG).
    scoring = {"ransac": "inliers"}.get(method, method)
    auto_fused = (
        method in ("ransac", "msac", "magsac")
        and solver == "aca"
        and confidence is None
        and sampling == "uniform"
        and jax.default_backend() == "tpu"
    )
    if method == "fused" or auto_fused:
        b = -(-max_iters // 128) * 128
        config = RansacConfig(
            num_hypotheses=b,
            threshold=ransac_reproj_threshold,
            solver="aca",
            refine_iters=refine_iters,
            scoring="inliers" if method == "fused" else scoring,
        )
        res = ransac_homography_fused(key, src, tar, config)
    elif confidence is not None:
        chunk = min(256, max_iters)
        config = RansacConfig(
            num_hypotheses=chunk,
            threshold=ransac_reproj_threshold,
            solver=solver,
            refine_iters=refine_iters,
            scoring={"ransac": "inliers"}.get(method, method),
            sampling=sampling,
        )
        res = ransac_homography_adaptive(
            key, src, tar, config,
            confidence=confidence, max_chunks=-(-max_iters // chunk),
        )
    else:
        config = RansacConfig(
            num_hypotheses=max_iters,
            threshold=ransac_reproj_threshold,
            solver=solver,
            refine_iters=refine_iters,
            scoring={"ransac": "inliers"}.get(method, method),
            sampling=sampling,
        )
        res = ransac_homography(key, src, tar, config)
    return res.h, res.inlier_mask


def get_perspective_transform(src: Array, tar: Array, solver: str = "aca") -> Array:
    """Exact 4-point homography (the ``cv2.getPerspectiveTransform`` shape).

    The reference's GPT-LU baseline is OpenCV's implementation of exactly this
    call (``C++ Codes/modules/GPT.cpp:51-72``, ~1932 flops); here the default
    solver is the 97-flop ACA decomposition (identical result for exact
    4-point input, batched over leading dims).

    Args:
      src, tar: (..., 4, 2) quads.
      solver: any name in ``sks_tpu.ops.SOLVERS`` ('aca', 'sks', 'gpt_lu', ...).

    Returns:
      (..., 3, 3) H with H[..., 2, 2] = 1 mapping src onto tar.
    """
    from sks_tpu.ops import SOLVERS

    return SOLVERS[solver](jnp.asarray(src), jnp.asarray(tar))


def get_affine_transform(src: Array, tar: Array) -> Array:
    """Exact 3-point affine transform (the ``cv2.getAffineTransform`` shape).

    Division-free analogue (see ``sks_tpu.ops.affine``): (..., 3, 2) x2 ->
    (..., 2, 3) affine matrix rows [A | t] with tar = A @ src + t.
    """
    from sks_tpu.ops.affine import affine_3pt

    return affine_3pt(jnp.asarray(src), jnp.asarray(tar))[..., :2, :]
