"""ACA-rect / TensorACA — rectangle-to-quadrilateral homography (batched).

Capability parity with ``TensorACA_rect`` (``PyTorch Codes/Modules_Runtime_Test.py:286-309``)
and ``Matlab Codes/ACA_rect.m`` — the specialization of ACA to a source quad that
is an axis-aligned rectangle, i.e. the "4-point offsets" parameterization used by
deep homography networks (47 flops up to scale / 59 normalized; 44 for a square;
``README.md:56-59``).

Derivation (specializing :mod:`sks_tpu.ops.aca`): with source corners
``M=(x0,y0), N=(x0+w,y0), P=(x0,y0+h), Q=(x0+w,y0+h)`` the source affine frame is
``A1 = diag(w, h)`` and the homogeneous canonical coordinates of Q collapse to
``alpha = beta = f1 = w h``.  The division-free core then depends on the *target*
frame only:

    c + e = -gamma,   d + e = -delta,   c = delta - f2,  d = gamma - f2,
    e = f2 - gamma - delta

with ``(gamma, delta) = adj(A2)(Q2-M2)`` and ``f2 = det A2``.  The source-side
factor reduces to the up-to-scale axis rescaling
``[[h, 0, -x0 h], [0, w, -y0 w], [0, 0, w h]]``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

__all__ = [
    "aca_rect_h",
    "aca_rect",
    "aca_square_h",
    "aca_square",
    "aca_qr_h",
    "aca_qr",
    "rect_corners",
]


def rect_corners(origin: Array, size: Array) -> Array:
    """Corners [M, N, P, Q] of the axis-aligned rect at ``origin`` with ``size``.

    origin: (..., 2) = (x0, y0); size: (..., 2) = (w, h).
    Returns (..., 4, 2) in the solver's [M, N, P, Q] order
    (M=top-left, N=top-right, P=bottom-left, Q=bottom-right in image coords).
    """
    x0, y0 = origin[..., 0], origin[..., 1]
    w, h = size[..., 0], size[..., 1]
    return jnp.stack(
        [
            jnp.stack([x0, y0], axis=-1),
            jnp.stack([x0 + w, y0], axis=-1),
            jnp.stack([x0, y0 + h], axis=-1),
            jnp.stack([x0 + w, y0 + h], axis=-1),
        ],
        axis=-2,
    )


def _target_mid(tar: Array):
    """Target-side factor ``H_mid = H_A2^{-1} @ H_C`` of the rect family.

    Shared by every source-rectangle specialization — the rect/square/QR
    variants differ only in the (trivial) source-side factor.  Returns the six
    upper entries of H_mid plus its last row ``(c, d, e)``.
    """
    m2 = tar[..., 0, :]
    e2 = tar[..., 1, :] - m2
    f2v = tar[..., 2, :] - m2
    g2 = tar[..., 3, :] - m2
    e2x, e2y = e2[..., 0], e2[..., 1]
    f2x, f2y = f2v[..., 0], f2v[..., 1]
    g2x, g2y = g2[..., 0], g2[..., 1]
    f2 = e2x * f2y - e2y * f2x
    gamma = f2y * g2x - f2x * g2y
    delta = -e2y * g2x + e2x * g2y

    c = delta - f2
    d = gamma - f2
    e = f2 - gamma - delta
    ce = -gamma
    de = -delta

    m2x, m2y = m2[..., 0], m2[..., 1]
    t00 = e2x * ce + m2x * c
    t01 = f2x * de + m2x * d
    t02 = m2x * e
    t10 = e2y * ce + m2y * c
    t11 = f2y * de + m2y * d
    t12 = m2y * e
    return t00, t01, t02, t10, t11, t12, c, d, e


def aca_rect_h(tar: Array, origin: Array, size: Array) -> Array:
    """Up-to-scale homography from an axis-aligned rect to a quadrilateral.

    Args:
      tar: (..., 4, 2) target points corresponding to :func:`rect_corners` order.
      origin: (..., 2) rect top-left (x0, y0).  Broadcasts against ``tar``.
      size: (..., 2) rect (width, height).

    Returns:
      (..., 3, 3) homography, unnormalized.
    """
    t00, t01, t02, t10, t11, t12, c, d, e = _target_mid(tar)

    # Right factor: [[h, 0, -x0 h], [0, w, -y0 w], [0, 0, w h]] (up to scale).
    x0, y0 = origin[..., 0], origin[..., 1]
    w, h = size[..., 0], size[..., 1]
    wh = w * h

    h00 = t00 * h
    h01 = t01 * w
    h02 = -(t00 * x0 * h + t01 * y0 * w) + t02 * wh
    h10 = t10 * h
    h11 = t11 * w
    h12 = -(t10 * x0 * h + t11 * y0 * w) + t12 * wh
    h20 = c * h
    h21 = d * w
    h22 = -(c * x0 * h + d * y0 * w) + e * wh

    return jnp.stack(
        [
            jnp.stack([h00, h01, h02], axis=-1),
            jnp.stack([h10, h11, h12], axis=-1),
            jnp.stack([h20, h21, h22], axis=-1),
        ],
        axis=-2,
    )


def aca_rect(tar: Array, origin: Array, size: Array) -> Array:
    """Rect-to-quad homography normalized to ``H[2,2] == 1``.

    Deep-homography pipelines can skip this normalization entirely
    (the reference notes the same, ``Matlab Codes/ACA_rect.m:33-36``) —
    use :func:`aca_rect_h` there.
    """
    hm = aca_rect_h(tar, origin, size)
    return hm / hm[..., 2:3, 2:3]


def aca_square_h(tar: Array, origin: Array, side: Array) -> Array:
    """Up-to-scale homography from an axis-aligned *square* to a quadrilateral.

    The square case of :func:`aca_rect_h` (the reference counts 14 vector ops /
    44 FLOPs, ``README.md:57``, ``Matlab Codes/ACA_rect.m:30``): with
    ``w == h == side`` the per-column width/height rescale collapses to one
    common factor that cancels up to scale, leaving only the translation terms.

    Args:
      tar: (..., 4, 2) target points in :func:`rect_corners` order.
      origin: (..., 2) square top-left (x0, y0).
      side: (...,) square side length.

    Returns:
      (..., 3, 3) homography, unnormalized.
    """
    t00, t01, t02, t10, t11, t12, c, d, e = _target_mid(tar)
    x0, y0 = origin[..., 0], origin[..., 1]
    s = side

    h02 = -(t00 * x0 + t01 * y0) + t02 * s
    h12 = -(t10 * x0 + t11 * y0) + t12 * s
    h22 = -(c * x0 + d * y0) + e * s
    return jnp.stack(
        [
            jnp.stack([t00, t01, h02], axis=-1),
            jnp.stack([t10, t11, h12], axis=-1),
            jnp.stack([c, d, h22], axis=-1),
        ],
        axis=-2,
    )


def aca_square(tar: Array, origin: Array, side: Array) -> Array:
    """Square-to-quad homography normalized to ``H[2,2] == 1``."""
    hm = aca_square_h(tar, origin, side)
    return hm / hm[..., 2:3, 2:3]


def aca_qr_h(tar: Array) -> Array:
    """Up-to-scale homography from the *unit square at the origin* to a quad.

    The QR-code-detection case (``README.md:59``: 29 FLOPs): source corners
    ``(0,0),(1,0),(0,1),(1,1)`` make the whole source-side factor the identity,
    so the homography is the bare target factor ``H_A2^{-1} @ H_C`` — detector
    corner order maps straight through :func:`rect_corners` order [M, N, P, Q].
    Rescale QR module coordinates into this unit frame (or compose with an
    axis scale) rather than calling the general rect solver.

    Args:
      tar: (..., 4, 2) detected corner positions.

    Returns:
      (..., 3, 3) homography, unnormalized.
    """
    t00, t01, t02, t10, t11, t12, c, d, e = _target_mid(tar)
    return jnp.stack(
        [
            jnp.stack([t00, t01, t02], axis=-1),
            jnp.stack([t10, t11, t12], axis=-1),
            jnp.stack([c, d, e], axis=-1),
        ],
        axis=-2,
    )


def aca_qr(tar: Array) -> Array:
    """Unit-square-to-quad homography normalized to ``H[2,2] == 1``."""
    hm = aca_qr_h(tar)
    return hm / hm[..., 2:3, 2:3]
