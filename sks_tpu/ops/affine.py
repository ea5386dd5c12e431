"""3-point affine transform solver (batched, division-free up to scale).

Capability parity with the reference's affine claim (``README.md:62-64``: SKS
and ACA "manage affine transformations in a unified way ... FLOPs of computing
affine transformations with three points is significantly reduced, especially
compared to the GPT-LU method (see OpenCV's function 'getAffineTransform')").

An affine map is the sub-case of ACA with no projective component: using the
per-plane affine frames ``A = [N - M, P - M]`` (the same frames as
:mod:`sks_tpu.ops.aca`), the unique affine map taking ``M1,N1,P1`` to
``M2,N2,P2`` is ``x -> A2 A1^{-1} (x - M1) + M2``.  Deferring the division by
``det A1`` gives the division-free homogeneous form

    H = [[A2 adj(A1),  f1 M2 - A2 adj(A1) M1],
         [0, 0, f1]],          f1 = det A1

(24 FLOPs up to scale) — the affine analogue of the division-free ACA chain,
versus ~500 FLOPs for the 6x6 LU behind ``getAffineTransform``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

__all__ = ["affine_3pt_h", "affine_3pt", "affine_valid_mask"]


def affine_3pt_h(src: Array, tar: Array) -> Array:
    """Up-to-scale affine transform from 3 correspondences, division-free.

    Args:
      src: (..., 3, 2) source points [M1, N1, P1] (extra points ignored, so
        (..., 4, 2) minimal-solver layouts can be passed directly).
      tar: (..., 3, 2) target points [M2, N2, P2].

    Returns:
      (..., 3, 3) homogeneous affine matrix with last row ``[0, 0, det A1]``.
    """
    m1 = src[..., 0, :]
    e1 = src[..., 1, :] - m1
    f1v = src[..., 2, :] - m1
    m2 = tar[..., 0, :]
    e2 = tar[..., 1, :] - m2
    f2v = tar[..., 2, :] - m2

    f1 = e1[..., 0] * f1v[..., 1] - e1[..., 1] * f1v[..., 0]

    # A2 @ adj(A1): columns of A are the frame axes (e, f).
    # adj(A1) = [[f1y, -f1x], [-e1y, e1x]].
    t00 = e2[..., 0] * f1v[..., 1] - f2v[..., 0] * e1[..., 1]
    t01 = -e2[..., 0] * f1v[..., 0] + f2v[..., 0] * e1[..., 0]
    t10 = e2[..., 1] * f1v[..., 1] - f2v[..., 1] * e1[..., 1]
    t11 = -e2[..., 1] * f1v[..., 0] + f2v[..., 1] * e1[..., 0]

    t02 = f1 * m2[..., 0] - (t00 * m1[..., 0] + t01 * m1[..., 1])
    t12 = f1 * m2[..., 1] - (t10 * m1[..., 0] + t11 * m1[..., 1])

    zero = jnp.zeros_like(f1)
    return jnp.stack(
        [
            jnp.stack([t00, t01, t02], axis=-1),
            jnp.stack([t10, t11, t12], axis=-1),
            jnp.stack([zero, zero, f1], axis=-1),
        ],
        axis=-2,
    )


def affine_3pt(src: Array, tar: Array) -> Array:
    """Affine transform normalized to ``H[2,2] == 1`` (exact affine last row).

    The 3-point analogue of OpenCV's ``getAffineTransform``: one division by
    ``det A1`` instead of a 6x6 LU solve.
    """
    h = affine_3pt_h(src, tar)
    return h / h[..., 2:3, 2:3]


def affine_valid_mask(src: Array, eps: float | None = None) -> Array:
    """True where the 3 source points are not (numerically) collinear."""
    if eps is None:
        eps = 32 * float(jnp.finfo(src.dtype).eps)
    m = src[..., 0, :]
    e = src[..., 1, :] - m
    f = src[..., 2, :] - m
    det = e[..., 0] * f[..., 1] - e[..., 1] * f[..., 0]
    s = jnp.maximum(jnp.abs(e).max(-1), jnp.abs(f).max(-1))
    return jnp.abs(det) > eps * s * s
