"""HO — Harker-O'Leary homography estimation (batched, N >= 4).

Capability parity with ``cv::runKernel_HO`` / ``my_normalizeDataIsotropic``
(``C++ Codes/modules/HO.cpp:33-270``) and the CUDA twin
(``GPU_Runtime Test.cu:788-1031``).  The method: after isotropic normalization,
the first six homography entries can be eliminated in closed form (a linear
least-squares in two independent 3-unknown blocks), leaving a 2N x 3 system in
``(h7, h8, h9)`` whose 3x3 normal matrix is solved by a smallest-eigenvector —
here in *closed form* (trigonometric 3x3 eigensolver) instead of the
reference's iterative device SVD.

Derivation used here (equivalent, TPU-friendly form): with normalized points
``(x,y) -> (X,Y)``, design matrix ``C = [x y 1]`` (N x 3) and ``g = (h7,h8,h9)``,
the DLT constraints read ``C u = diag(X) C g`` and ``C v = diag(Y) C g`` for
``u = (h1,h2,h3)``, ``v = (h4,h5,h6)``.  Least-squares elimination of u, v gives
the residual system ``D g = 0`` with

    D = [(P - I) diag(X) C ; (P - I) diag(Y) C],   P = C (C^T C)^{-1} C^T,

so ``g`` is the smallest eigenvector of ``D^T D`` and then
``u = (C^T C)^{-1} C^T diag(X) C g`` (same for v).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from sks_tpu.ops.linalg import smallest_eigvec_sym

__all__ = ["ho", "ho_h"]


def _iso_norm(pts: Array, w: Array):
    """Isotropic normalization: zero centroid, mean distance sqrt(2)."""
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    c = jnp.sum(pts * w[..., None], axis=-2, keepdims=True) / wsum[..., None]
    d = pts - c
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
    mean = jnp.sum(dist * w, axis=-1, keepdims=True) / wsum
    s = jnp.sqrt(jnp.asarray(2.0, pts.dtype)) / jnp.maximum(
        mean, jnp.finfo(pts.dtype).tiny
    )
    return d * s[..., None], (c[..., 0, 0], c[..., 0, 1], s[..., 0])


def _inv3_sym(g: Array) -> Array:
    """Closed-form inverse of symmetric 3x3 via adjugate."""
    a, b, c = g[..., 0, 0], g[..., 0, 1], g[..., 0, 2]
    d, e = g[..., 1, 1], g[..., 1, 2]
    f = g[..., 2, 2]
    ca = d * f - e * e
    cb = c * e - b * f
    cc = b * e - c * d
    cd = a * f - c * c
    ce = b * c - a * e
    cf = a * d - b * b
    det = a * ca + b * cb + c * cc
    inv = 1.0 / det
    return (
        jnp.stack(
            [
                jnp.stack([ca, cb, cc], axis=-1),
                jnp.stack([cb, cd, ce], axis=-1),
                jnp.stack([cc, ce, cf], axis=-1),
            ],
            axis=-2,
        )
        * inv[..., None, None]
    )


def ho_h(src: Array, tar: Array, weights: Array | None = None) -> Array:
    """Up-to-scale Harker-O'Leary homography.

    Args:
      src, tar: (..., N, 2), N >= 4 (static).
      weights: optional (..., N); zero drops a point.

    Returns:
      (..., 3, 3) homography, unnormalized.
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    sn, (cx1, cy1, s1) = _iso_norm(src, weights)
    tn, (cx2, cy2, s2) = _iso_norm(tar, weights)

    x, y = sn[..., 0], sn[..., 1]
    xp, yp = tn[..., 0], tn[..., 1]
    one = jnp.ones_like(x)
    c = jnp.stack([x, y, one], axis=-1) * weights[..., None]  # weighted C
    cw = jnp.stack([x, y, one], axis=-1)

    g3 = jnp.einsum("...ni,...nj->...ij", c, cw)  # C^T W C
    ginv = _inv3_sym(g3)

    def reduced(vals):
        # rows R = (P - I) diag(vals) C, weighted; avoid forming P (N x N):
        # R = C Ginv C^T W diag(vals) C - diag(vals) C.
        dc = vals[..., None] * cw  # diag(vals) C, (..., N, 3)
        ctwd = jnp.einsum("...ni,...nj->...ij", c, dc)  # C^T W diag(vals) C
        proj = jnp.einsum("...ni,...ij,...jk->...nk", cw, ginv, ctwd)
        return proj - dc, ctwd

    rx, mx = reduced(xp)
    ry, my = reduced(yp)
    dtd = jnp.einsum("...ni,...n,...nj->...ij", rx, weights, rx) + jnp.einsum(
        "...ni,...n,...nj->...ij", ry, weights, ry
    )
    g = smallest_eigvec_sym(dtd, method="closed3")

    u = jnp.einsum("...ij,...jk,...k->...i", ginv, mx, g)
    v = jnp.einsum("...ij,...jk,...k->...i", ginv, my, g)
    hm = jnp.stack([u, v, g], axis=-2)

    # Denormalize with the isotropic T's.
    z = jnp.zeros_like(s1)
    o = jnp.ones_like(s1)
    t1 = jnp.stack(
        [
            jnp.stack([s1, z, -s1 * cx1], axis=-1),
            jnp.stack([z, s1, -s1 * cy1], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
    t2inv = jnp.stack(
        [
            jnp.stack([1.0 / s2, z, cx2], axis=-1),
            jnp.stack([z, 1.0 / s2, cy2], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
    return t2inv @ hm @ t1


def ho(src: Array, tar: Array, weights: Array | None = None) -> Array:
    """HO homography normalized to ``H[2,2] == 1``."""
    h = ho_h(src, tar, weights)
    return h / h[..., 2:3, 2:3]
