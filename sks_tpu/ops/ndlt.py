"""NDLT — normalized Direct Linear Transform homography (batched, N >= 4).

Capability parity with ``cv::runKernel_DLT`` (``C++ Codes/modules/DLT.cpp:53-119``)
and the CUDA twin (``GPU_Runtime Test.cu:1034-1160``): Hartley-normalize both
point sets, accumulate the 9x9 normal matrix of the stacked DLT constraints,
take the smallest eigenvector, denormalize.  TPU-first differences: batched over
arbitrary leading dims, optional per-point weights (so padded fixed-shape point
sets and IRLS reweighting work under jit), and a branch-free fixed-sweep Jacobi
eigensolver instead of the reference's branchy Golub-Reinsch device SVD.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from sks_tpu.ops.linalg import jacobi_eigh, smallest_eigvec_sym

__all__ = ["ndlt", "ndlt_h"]


def _hartley(pts: Array, w: Array):
    """Anisotropic Hartley normalization (per-axis mean absolute deviation).

    Returns (normalized points, (cx, cy, sx, sy)) with x' = sx (x - cx) etc.
    """
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    c = jnp.sum(pts * w[..., None], axis=-2, keepdims=True) / wsum[..., None]
    d = pts - c
    dev = jnp.sum(jnp.abs(d) * w[..., None], axis=-2) / wsum
    s = 1.0 / jnp.maximum(dev, jnp.finfo(pts.dtype).tiny)
    return d * s[..., None, :], (c[..., 0, 0], c[..., 0, 1], s[..., 0], s[..., 1])


def ndlt_h(
    src: Array,
    tar: Array,
    weights: Array | None = None,
    eig_method: str = "jacobi",
) -> Array:
    """Up-to-scale NDLT homography.

    Args:
      src, tar: (..., N, 2) correspondences, N >= 4 (static).
      weights: optional (..., N) nonnegative weights; zero drops a point, so a
        fixed-shape padded batch supports variable point counts under jit.
      eig_method: 'jacobi' (default, branch-free) or 'eigh' (XLA eigensolver).

    Returns:
      (..., 3, 3) homography, unnormalized.
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    sn, (cx1, cy1, sx1, sy1) = _hartley(src, weights)
    tn, (cx2, cy2, sx2, sy2) = _hartley(tar, weights)

    x, y = sn[..., 0], sn[..., 1]
    xp, yp = tn[..., 0], tn[..., 1]
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    # Two constraint rows per point: the classic DLT stacking.
    rows_x = jnp.stack(
        [x, y, one, zero, zero, zero, -xp * x, -xp * y, -xp], axis=-1
    )
    rows_y = jnp.stack(
        [zero, zero, zero, x, y, one, -yp * x, -yp * y, -yp], axis=-1
    )
    a = jnp.concatenate([rows_x, rows_y], axis=-2)  # (..., 2N, 9)
    w2 = jnp.concatenate([weights, weights], axis=-1)
    ltl = jnp.einsum("...np,...n,...nq->...pq", a, w2, a)

    if eig_method == "jacobi":
        _, v = jacobi_eigh(ltl)
        h = v[..., :, 0]
    else:
        h = smallest_eigvec_sym(ltl, method=eig_method)
    hm = h.reshape(*h.shape[:-1], 3, 3)

    # Denormalize: H = T2^{-1} @ Hn @ T1 with T = [[sx,0,-sx cx],[0,sy,-sy cy],[0,0,1]].
    t1 = _t_matrix(cx1, cy1, sx1, sy1)
    t2inv = _t_inv_matrix(cx2, cy2, sx2, sy2)
    return t2inv @ hm @ t1


def _t_matrix(cx, cy, sx, sy):
    z = jnp.zeros_like(cx)
    o = jnp.ones_like(cx)
    return jnp.stack(
        [
            jnp.stack([sx, z, -sx * cx], axis=-1),
            jnp.stack([z, sy, -sy * cy], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def _t_inv_matrix(cx, cy, sx, sy):
    z = jnp.zeros_like(cx)
    o = jnp.ones_like(cx)
    return jnp.stack(
        [
            jnp.stack([1.0 / sx, z, cx], axis=-1),
            jnp.stack([z, 1.0 / sy, cy], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def ndlt(
    src: Array,
    tar: Array,
    weights: Array | None = None,
    eig_method: str = "jacobi",
) -> Array:
    """NDLT homography normalized to ``H[2,2] == 1``."""
    h = ndlt_h(src, tar, weights, eig_method)
    return h / h[..., 2:3, 2:3]
