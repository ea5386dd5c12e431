"""Homography action, residuals, and synthesis from camera geometry.

The synthesis path is the automated equivalent of the reference's only
correctness oracle (``Matlab Codes/veri_4Pts.m``): build an exact homography
``H = K2 [r1 r2 t] K1^{-1}``-style from camera intrinsics/extrinsics and a
world plane, then check solvers reproduce it up to scale.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

__all__ = [
    "apply_homography",
    "reprojection_error",
    "symmetric_transfer_error",
    "homography_from_pose",
    "normalize_h",
    "inv_h",
]


def apply_homography(h: Array, pts: Array) -> Array:
    """Apply (..., 3, 3) homography to (..., N, 2) points -> (..., N, 2).

    Batch dims of ``h`` and ``pts`` broadcast.
    """
    x, y = pts[..., 0], pts[..., 1]
    hb = h[..., None, :, :]  # broadcast over N
    u = hb[..., 0, 0] * x + hb[..., 0, 1] * y + hb[..., 0, 2]
    v = hb[..., 1, 0] * x + hb[..., 1, 1] * y + hb[..., 1, 2]
    w = hb[..., 2, 0] * x + hb[..., 2, 1] * y + hb[..., 2, 2]
    inv = 1.0 / w
    return jnp.stack([u * inv, v * inv], axis=-1)


def reprojection_error(h: Array, src: Array, tar: Array) -> Array:
    """Forward transfer error ||H(src) - tar|| per point: (..., N)."""
    d = apply_homography(h, src) - tar
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def symmetric_transfer_error(h: Array, src: Array, tar: Array) -> Array:
    """Squared symmetric transfer error per point: (..., N).

    ``||H(src) - tar||^2 + ||H^{-1}(tar) - src||^2`` — the classic RANSAC
    scoring residual.  The inverse uses the adjugate (no division; scale of a
    homography is free).
    """
    d1 = apply_homography(h, src) - tar
    d2 = apply_homography(inv_h(h), tar) - src
    return jnp.sum(d1 * d1, axis=-1) + jnp.sum(d2 * d2, axis=-1)


def inv_h(h: Array) -> Array:
    """Up-to-scale inverse of a homography: the adjugate (division-free)."""
    a, b, c = h[..., 0, 0], h[..., 0, 1], h[..., 0, 2]
    d, e, f = h[..., 1, 0], h[..., 1, 1], h[..., 1, 2]
    g, i, j = h[..., 2, 0], h[..., 2, 1], h[..., 2, 2]
    return jnp.stack(
        [
            jnp.stack([e * j - f * i, c * i - b * j, b * f - c * e], axis=-1),
            jnp.stack([f * g - d * j, a * j - c * g, c * d - a * f], axis=-1),
            jnp.stack([d * i - e * g, b * g - a * i, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )


def normalize_h(h: Array, mode: str = "last") -> Array:
    """Canonicalize the free scale of a homography.

    mode 'last': divide by H[2,2] (reference convention).
    mode 'fro':  unit Frobenius norm with positive H[2,2] — well-defined even
    for affine-limit homographies, the framework's preferred canonical form.
    """
    if mode == "last":
        return h / h[..., 2:3, 2:3]
    if mode == "fro":
        n = jnp.sqrt(jnp.sum(h * h, axis=(-2, -1), keepdims=True))
        s = jnp.sign(h[..., 2:3, 2:3])
        s = jnp.where(s == 0, jnp.ones_like(s), s)
        return h / (n * s)
    raise ValueError(f"unknown mode {mode!r}")


def homography_from_pose(
    k1: Array, k2: Array, r: Array, t: Array, n: Array, d: Array
) -> Array:
    """Exact plane-induced homography between two cameras.

    For a world plane ``n . X = d`` seen by camera 1 (identity pose, intrinsics
    ``k1``) and camera 2 at ``(r, t)`` (intrinsics ``k2``):

        H = k2 (r + t n^T / d) k1^{-1}

    Args:
      k1, k2: (..., 3, 3) intrinsics.  r: (..., 3, 3).  t: (..., 3).
      n: (..., 3) unit plane normal (camera-1 frame).  d: (...,) plane depth.

    Returns:
      (..., 3, 3) homography mapping camera-1 pixels to camera-2 pixels.
    """
    outer = t[..., :, None] * n[..., None, :] / d[..., None, None]
    core = r + outer
    return k2 @ core @ jnp.linalg.inv(k1)
