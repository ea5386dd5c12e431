"""Double-float ("df64") arithmetic: fp64-parity accuracy on fp32-only TPUs.

The reference ships fp64 twins of every solver (``sks::runKernel_ACA_double``,
``ACA_SKS.cpp:104-179``; CUDA kernels are fp64 throughout,
``GPU_Runtime Test.cu:81-151``) because RANSAC pipelines care about solver
accuracy.  TPUs have no fast native fp64, so this module supplies the standard
alternative: *double-word* (a.k.a. double-float / df64) arithmetic, an unevaluated
sum ``hi + lo`` of two fp32 values carrying ~49 bits of significand — enough to
match fp64 parity configs (``BASELINE.json`` config 1) on the 85-flop ACA chain.

Built on the classic error-free transforms (Dekker's split/product, Knuth's
two-sum) — branch-free, elementwise, batched, and differentiable like any other
jnp code.  The :class:`DF` type overloads ``+ - *`` so the *same*
:func:`sks_tpu.ops.aca.aca_core` straight-line body computes either fp32 or
df64 homographies — no duplicated solver source (the reference maintains the
fp32/fp64 pair by hand; see SURVEY.md §1).

Caveat: error-free transforms assume IEEE round-to-nearest single ops without
silent FMA contraction/reassociation; XLA preserves elementwise fp semantics,
and the accuracy tests in ``tests/test_df64.py`` guard the assumption.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from sks_tpu.ops.aca import aca_core

__all__ = ["DF", "df_lift", "df_from_f64", "df_to_f64", "aca_df64_h", "aca_df64"]

# Dekker split constant for fp32 (2^12 + 1); fp64 inputs use 2^27 + 1.
_SPLIT = {jnp.dtype("float32"): 4097.0, jnp.dtype("float64"): 134217729.0}


def _two_sum(a: Array, b: Array):
    """Error-free a + b = s + e (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a: Array, b: Array):
    """Error-free a + b = s + e, assuming |a| >= |b|."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a: Array):
    """Dekker split: a = hi + lo with hi, lo each half-width."""
    c = jnp.asarray(_SPLIT[jnp.dtype(a.dtype)], a.dtype) * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a: Array, b: Array):
    """Error-free a * b = p + e (Dekker, FMA-free)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


class DF(NamedTuple):
    """Unevaluated sum ``hi + lo`` (|lo| <= ulp(hi)/2) with df64 operators."""

    hi: Array
    lo: Array

    def __add__(self, other: "DF") -> "DF":
        s, e = _two_sum(self.hi, other.hi)
        e = e + (self.lo + other.lo)
        return DF(*_quick_two_sum(s, e))

    def __sub__(self, other: "DF") -> "DF":
        return self + (-other)

    def __neg__(self) -> "DF":
        return DF(-self.hi, -self.lo)

    def __mul__(self, other: "DF") -> "DF":
        p, e = _two_prod(self.hi, other.hi)
        e = e + (self.hi * other.lo + self.lo * other.hi)
        return DF(*_quick_two_sum(p, e))

    def __truediv__(self, other: "DF") -> "DF":
        # One Newton correction on the fp32 quotient.
        q0 = self.hi / other.hi
        r = self - DF(q0, jnp.zeros_like(q0)) * other
        q1 = (r.hi + r.lo) / other.hi
        return DF(*_quick_two_sum(q0, q1))


def df_lift(x: Array) -> DF:
    """Exact fp32 array -> DF (lo = 0)."""
    return DF(x, jnp.zeros_like(x))


def df_from_f64(x: Array) -> DF:
    """Split an fp64 array into a df64 pair of fp32 words (lossless to ~49 bits)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return DF(hi, lo)


def df_to_f64(x: DF) -> Array:
    """Evaluate the unevaluated sum in fp64 (for verification on CPU)."""
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def _df_components(pts: Array | DF):
    if not isinstance(pts, DF):
        pts = df_lift(pts)
    hi = pts.hi.reshape(*pts.hi.shape[:-2], 8)
    lo = pts.lo.reshape(*pts.lo.shape[:-2], 8)
    return tuple(DF(hi[..., i], lo[..., i]) for i in range(8))


def aca_df64_h(src: Array | DF, tar: Array | DF) -> DF:
    """Up-to-scale ACA homography in df64 precision.

    Runs the identical division-free straight-line body as :func:`aca_h`
    (``sks_tpu.ops.aca.aca_core``) with every op in double-word arithmetic.

    Args:
      src, tar: (..., 4, 2) fp32 arrays, or :class:`DF` pairs of them when the
        inputs themselves need more than fp32 precision.

    Returns:
      DF of two (..., 3, 3) fp32 arrays; ``hi`` alone is the correctly-rounded
      fp32 homography, ``hi + lo`` carries ~49 bits.
    """
    h = aca_core(*_df_components(src), *_df_components(tar))
    hi = jnp.stack([e.hi for e in h], axis=-1).reshape(*h[0].hi.shape, 3, 3)
    lo = jnp.stack([e.lo for e in h], axis=-1).reshape(*h[0].lo.shape, 3, 3)
    return DF(hi, lo)


def aca_df64(src: Array | DF, tar: Array | DF) -> DF:
    """df64 ACA homography normalized to ``H[2,2] == 1`` (df64 division)."""
    h = aca_df64_h(src, tar)
    denom = DF(h.hi[..., 2:3, 2:3], h.lo[..., 2:3, 2:3])
    return h / denom
