"""Batched small-matrix linear algebra for the solver baselines.

TPU-first replacements for the reference's per-thread numerics: the CUDA device
Golub-Reinsch SVD (``GPU_Runtime Test.cu:527-785``) is branch-heavy,
data-dependent (implicit-shift QR with convergence tests) and hostile to a SIMD
machine; here the same capability is provided by

  * a *fixed-iteration* cyclic Jacobi eigensolver for small symmetric matrices
    (branch-free, unrolled, vectorizes over the batch), and
  * a closed-form smallest-eigenvector for the 3x3 symmetric case,
  * an unrolled no-pivot Gauss-Jordan solve for small dense systems
    (the TPU analogue of the CUDA 8x8 LU at ``GPU_Runtime Test.cu:242-357``).

All functions broadcast over leading batch dimensions and preserve dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

__all__ = [
    "jacobi_eigh",
    "smallest_eigvec_sym",
    "solve_unrolled",
]


def jacobi_eigh(a: Array, sweeps: int = 8):
    """Eigendecomposition of small symmetric matrices by cyclic Jacobi.

    Branch-free fixed-sweep Jacobi: every (p, q) pair is rotated each sweep with
    an angle that is exactly zero when the off-diagonal entry is zero, so no
    convergence test is needed.  For 9x9 inputs, 8 sweeps reach fp32 roundoff.

    Args:
      a: (..., n, n) symmetric.
      sweeps: number of full cyclic sweeps (static).

    Returns:
      (eigenvalues (..., n) ascending, eigenvectors (..., n, n) columns).
    """
    n = a.shape[-1]
    v = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    # Smallest normal; added (un-squared: tiny**2 underflows to 0) under the
    # hypot sqrt so an already-diagonal pair gives t = 0/sqrt(tiny), not 0/0.
    tiny = jnp.asarray(jnp.finfo(a.dtype).tiny, a.dtype)

    def rotate(carry, pq):
        a_, v_ = carry
        p, q = pq
        app = a_[..., p, p]
        aqq = a_[..., q, q]
        apq = a_[..., p, q]
        # Stable Jacobi rotation, written overflow-free so it is differentiable
        # everywhere: the textbook t = sign(theta)/(|theta|+sqrt(theta^2+1))
        # with theta = tau/apq divides by apq (overflows when apq ~ 0, and the
        # overflow NaNs the backward pass even under a where-guard).  Multiply
        # numerator and denominator by |apq| instead:
        #   t = sign(tau) * apq / (|tau| + sqrt(tau^2 + apq^2)),
        # which is |t| <= 1, exactly 0 at apq = 0 (identity rotation), and has
        # finite gradients once the hypot is floored away from 0.
        tau = (aqq - app) * 0.5
        sgn = jnp.where(tau >= 0, 1.0, -1.0).astype(a_.dtype)
        hyp = jnp.sqrt(tau * tau + apq * apq + tiny)
        t = sgn * apq / (sgn * tau + hyp)
        c = 1.0 / jnp.sqrt(t * t + 1)
        s = t * c
        c_, s_ = c[..., None], s[..., None]

        rp = a_[..., p, :]
        rq = a_[..., q, :]
        a_ = a_.at[..., p, :].set(c_ * rp - s_ * rq)
        a_ = a_.at[..., q, :].set(s_ * rp + c_ * rq)
        cp = a_[..., :, p]
        cq = a_[..., :, q]
        a_ = a_.at[..., :, p].set(c_ * cp - s_ * cq)
        a_ = a_.at[..., :, q].set(s_ * cp + c_ * cq)
        vp = v_[..., :, p]
        vq = v_[..., :, q]
        v_ = v_.at[..., :, p].set(c_ * vp - s_ * vq)
        v_ = v_.at[..., :, q].set(s_ * vp + c_ * vq)
        return (a_, v_), None

    pairs = [(p, q) for p in range(n) for q in range(p + 1, n)]

    def sweep(_, carry):
        for pq in pairs:
            carry, _ = rotate(carry, pq)
        return carry

    a, v = jax.lax.fori_loop(0, sweeps, sweep, (a, v))

    w = jnp.diagonal(a, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[..., None, :], axis=-1)
    return w, v


def _smallest_eigvec_3x3(a: Array) -> Array:
    """Closed-form unit eigenvector of the smallest eigenvalue of symmetric 3x3.

    Analytic eigenvalues via the trigonometric (Cardano) method, eigenvector via
    the largest cross product of rows of ``A - lambda I`` (branch-free).
    """
    dtype = a.dtype
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    b = a - q[..., None, None] * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(b * b, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, jnp.finfo(dtype).tiny))
    detb = jnp.linalg.det(b / p[..., None, None])
    # Clip strictly inside (-1, 1): arccos' gradient is infinite at the ends,
    # which would NaN the backward pass for exactly-degenerate eigenvalues.
    lim = 1.0 - 8 * jnp.finfo(dtype).eps
    r = jnp.clip(detb / 2.0, -lim, lim)
    phi = jnp.arccos(r) / 3.0
    # Smallest eigenvalue of the three.
    lam = q + 2 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    m = a - lam[..., None, None] * jnp.eye(3, dtype=dtype)
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    cands = jnp.stack([c01, c02, c12], axis=-2)
    norms = jnp.sum(cands * cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    vec = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    nrm = jnp.sqrt(jnp.maximum(jnp.sum(vec * vec, axis=-1, keepdims=True),
                               jnp.finfo(dtype).tiny))
    vec = vec / nrm

    # One Rayleigh-shifted inverse-iteration step.  The trigonometric
    # eigenvalue is only O(sqrt(eps))-accurate in the worst case, and the
    # cross-product eigenvector inherits that error — observable as ~1e-8
    # relative error at f64, which downstream denormalization (HO/NDLT)
    # amplifies by ~1e5.  (A - rho I)^{-1} v ∝ adj(A - rho I) v needs no
    # division and one step restores O(eps/gap) accuracy.
    rho = jnp.einsum("...i,...ij,...j->...", vec, a, vec)
    b = a - rho[..., None, None] * jnp.eye(3, dtype=dtype)
    b00, b01, b02 = b[..., 0, 0], b[..., 0, 1], b[..., 0, 2]
    b11, b12, b22 = b[..., 1, 1], b[..., 1, 2], b[..., 2, 2]
    adj = jnp.stack([
        jnp.stack([b11 * b22 - b12 * b12, b02 * b12 - b01 * b22,
                   b01 * b12 - b02 * b11], axis=-1),
        jnp.stack([b02 * b12 - b01 * b22, b00 * b22 - b02 * b02,
                   b01 * b02 - b00 * b12], axis=-1),
        jnp.stack([b01 * b12 - b02 * b11, b01 * b02 - b00 * b12,
                   b00 * b11 - b01 * b01], axis=-1),
    ], axis=-2)
    w = jnp.einsum("...ij,...j->...i", adj, vec)
    wn2 = jnp.sum(w * w, axis=-1, keepdims=True)
    ok = wn2 > jnp.finfo(dtype).tiny
    w = w / jnp.sqrt(jnp.where(ok, wn2, 1.0))
    return jnp.where(ok, w, vec)


def smallest_eigvec_sym(a: Array, method: str = "auto") -> Array:
    """Unit eigenvector for the smallest eigenvalue of a symmetric (..., n, n).

    ``method``: 'auto' (closed form for n==3, Jacobi otherwise), 'jacobi',
    'eigh' (XLA's batched eigensolver), or 'closed3'.
    """
    n = a.shape[-1]
    if method == "auto":
        method = "closed3" if n == 3 else "jacobi"
    if method == "closed3":
        assert n == 3
        return _smallest_eigvec_3x3(a)
    if method == "jacobi":
        _, v = jacobi_eigh(a)
        return v[..., :, 0]
    if method == "eigh":
        _, v = jnp.linalg.eigh(a)
        return v[..., :, 0]
    raise ValueError(f"unknown method {method!r}")


def solve_unrolled(a: Array, b: Array, pivot: bool = False) -> Array:
    """Solve small dense systems by statically unrolled Gauss-Jordan.

    The TPU analogue of the reference's per-thread 8x8 LU
    (``GPU_Runtime Test.cu:242-357``): the elimination order is static, fully
    unrolled at trace time, and vectorizes over the batch; with
    ``pivot=True`` each step does a branch-free argmax row swap
    (one-hot matmul) for partial pivoting.

    Args:
      a: (..., n, n); b: (..., n) or (..., n, k).

    Returns:
      x with b's shape.
    """
    squeeze = b.ndim == a.ndim - 1
    if squeeze:
        b = b[..., None]
    n = a.shape[-1]
    t = jnp.concatenate([a, b], axis=-1)

    for k in range(n):
        if pivot:
            col = jnp.abs(t[..., k:, k])
            rel = jnp.argmax(col, axis=-1)
            sel = jax.nn.one_hot(rel + k, n, dtype=t.dtype)
            pivrow = jnp.einsum("...r,...rc->...c", sel, t)
            # Replace the selected row with row k (swap), branch-free.
            rowk = t[..., k, :]
            t = t + sel[..., :, None] * (rowk[..., None, :] - pivrow[..., None, :])
            t = t.at[..., k, :].set(pivrow)
        piv = t[..., k, k]
        inv = 1.0 / piv
        rowk = t[..., k, :] * inv[..., None]
        t = t.at[..., k, :].set(rowk)
        factors = t[..., :, k]
        update = factors[..., :, None] * rowk[..., None, :]
        mask = jnp.arange(n) != k
        t = jnp.where(mask[:, None], t - update, t)

    x = t[..., n:]
    return x[..., 0] if squeeze else x
