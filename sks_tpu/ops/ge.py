"""RHO-GE — 4-point homography by pivot-free Gaussian elimination (batched).

Capability parity with ``cv::runKernel_GE`` (``C++ Codes/modules/GE.cpp:44-188``,
from OpenCV rho.cpp / Bilaniuk et al. CVPRW'14) and the CUDA twin
(``GPU_Runtime Test.cu:359-507``): the same 8x8 system as GPT-LU, eliminated in
a fixed order with *no pivoting* — the speed/robustness trade the RHO paper
makes.  The reference hand-unrolls the elimination exploiting the block
sparsity; here the elimination is statically unrolled by the tracer and the
zero-block structure is exploited by eliminating the two 4x4 diagonal blocks
independently before coupling through the last two columns.

Structure used: with rows ordered [x-constraints; y-constraints],

    A = [ C  0  -diag(X) C2 ]        C  = [x y 1]  (4x3)
        [ 0  C  -diag(Y) C2 ]        C2 = [x y]    (4x2)

Eliminating u = (h1,h2,h3) from the top block against its first three rows
expresses u in terms of (h7,h8) and reduces row 3 to a 2-unknown equation;
likewise for v = (h4,h5,h6).  The two reduced equations form a 2x2 system in
(h7,h8); back-substitution recovers u, v.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

__all__ = ["rho_ge"]


def _solve3(c: Array, rhs: Array) -> Array:
    """Cramer solve of the 3x3 system ``[x y 1] u = rhs`` (4th row unused)."""
    det = (
        c[..., 0, 0] * (c[..., 1, 1] - c[..., 2, 1])
        - c[..., 0, 1] * (c[..., 1, 0] - c[..., 2, 0])
        + (c[..., 1, 0] * c[..., 2, 1] - c[..., 2, 0] * c[..., 1, 1])
    )
    inv = 1.0 / det

    # Explicit Cramer columns (rows 0..2 of C with last column == 1).
    x0, y0 = c[..., 0, 0], c[..., 0, 1]
    x1, y1 = c[..., 1, 0], c[..., 1, 1]
    x2, y2 = c[..., 2, 0], c[..., 2, 1]
    r0, r1, r2 = rhs[..., 0], rhs[..., 1], rhs[..., 2]
    u0 = (r0 * (y1 - y2) - y0 * (r1 - r2) + (r1 * y2 - r2 * y1)) * inv
    u1 = (x0 * (r1 - r2) - r0 * (x1 - x2) + (x1 * r2 - x2 * r1)) * inv
    u2 = (x0 * (y1 * r2 - y2 * r1) - y0 * (x1 * r2 - x2 * r1)
          + r0 * (x1 * y2 - x2 * y1)) * inv
    return jnp.stack([u0, u1, u2], axis=-1)


def rho_ge(src: Array, tar: Array) -> Array:
    """4-point homography with ``H[2,2] == 1``, pivot-free fixed elimination.

    Args:
      src, tar: (..., 4, 2).

    Returns:
      (..., 3, 3).  No pivoting: degenerate configurations that place a zero on
      the fixed pivot chain produce non-finite output (as in the reference).
    """
    x, y = src[..., 0], src[..., 1]
    xp, yp = tar[..., 0], tar[..., 1]

    c = jnp.stack([x, y], axis=-1)  # (..., 4, 2)

    # u(g) = u0 + U g  with g = (h7, h8): solve the first three x-rows for u
    # under each of rhs = X, rhs = x*X, rhs = y*X (linearity in g).
    u0 = _solve3(c, xp[..., :3])
    ux = _solve3(c, (x * xp)[..., :3])
    uy = _solve3(c, (y * xp)[..., :3])
    v0 = _solve3(c, yp[..., :3])
    vx = _solve3(c, (x * yp)[..., :3])
    vy = _solve3(c, (y * yp)[..., :3])

    # Row 3 (the fourth point) of each block gives the 2x2 system in g.
    x3, y3 = x[..., 3], y[..., 3]
    xp3, yp3 = xp[..., 3], yp[..., 3]

    def row_apply(u):
        return u[..., 0] * x3 + u[..., 1] * y3 + u[..., 2]

    # x-block row3:  row.u - x3 X3 h7 - y3 X3 h8 = X3
    #   with u = u0 + h7 ux + h8 uy:
    #   h7 (row.ux - x3 X3) + h8 (row.uy - y3 X3) = X3 - row.u0
    a11 = row_apply(ux) - x3 * xp3
    a12 = row_apply(uy) - y3 * xp3
    b1 = xp3 - row_apply(u0)
    a21 = row_apply(vx) - x3 * yp3
    a22 = row_apply(vy) - y3 * yp3
    b2 = yp3 - row_apply(v0)

    det = a11 * a22 - a12 * a21
    inv = 1.0 / det
    h7 = (b1 * a22 - b2 * a12) * inv
    h8 = (a11 * b2 - a21 * b1) * inv

    u = u0 + h7[..., None] * ux + h8[..., None] * uy
    v = v0 + h7[..., None] * vx + h8[..., None] * vy

    one = jnp.ones_like(h7)
    row3 = jnp.stack([h7, h8, one], axis=-1)
    return jnp.stack([u, v, row3], axis=-2)
