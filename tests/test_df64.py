"""df64 (double-float) arithmetic: fp64-parity accuracy from fp32 words.

Checks the error-free transforms are exact and that the df64 ACA chain reaches
near-fp64 accuracy (BASELINE.json config 1: "C++ CPU runtime test, fp64
parity") — orders of magnitude beyond plain fp32 on the same inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import jit_of
from sks_tpu.geom.homography import normalize_h
from sks_tpu.ops import aca
from sks_tpu.ops.df64 import (
    DF,
    _two_prod,
    _two_sum,
    aca_df64,
    df_from_f64,
    df_to_f64,
)

B = 64


def test_error_free_transforms(key):
    """two_sum / two_prod residuals are *exact* (verified in fp64)."""
    k1, k2 = jax.random.split(key)
    a = jax.random.uniform(k1, (1024,), jnp.float32, -1e3, 1e3)
    b = jax.random.uniform(k2, (1024,), jnp.float32, 1e-4, 1.0)

    s, e = jit_of(_two_sum)(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    got = s.astype(jnp.float64) + e.astype(jnp.float64)
    assert np.array_equal(np.asarray(exact), np.asarray(got))

    p, e = jit_of(_two_prod)(a, b)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    got = p.astype(jnp.float64) + e.astype(jnp.float64)
    assert np.array_equal(np.asarray(exact), np.asarray(got))


def test_df_mul_accuracy(key):
    """DF products carry ~2x the fp32 significand."""
    k1, k2 = jax.random.split(key)
    x64 = jax.random.uniform(k1, (4096,), jnp.float64, 0.5, 2.0)
    y64 = jax.random.uniform(k2, (4096,), jnp.float64, 0.5, 2.0)
    z = jit_of(lambda a, b: df_from_f64(a) * df_from_f64(b))(x64, y64)
    rel = np.abs(np.asarray(df_to_f64(z) - x64 * y64) / np.asarray(x64 * y64))
    assert rel.max() < 1e-13


def test_aca_df64_beats_f32(key, synth):
    """df64 ACA ~ fp64 accuracy; >= 10^3 tighter than fp32 on the same inputs."""
    src64, tar64, _ = synth(key, B, 4, 0.0, jnp.float64)
    h_ref = np.asarray(jit_of(aca)(src64, tar64))

    h32 = np.asarray(
        jit_of(aca)(src64.astype(jnp.float32), tar64.astype(jnp.float32))
    ).astype(np.float64)
    hdf = jit_of(lambda s, t: aca_df64(df_from_f64(s), df_from_f64(t)))(
        src64, tar64
    )
    hdf64 = np.asarray(df_to_f64(hdf))

    scale = np.abs(h_ref).max(axis=(-2, -1), keepdims=True)
    err32 = np.abs(h32 - h_ref).max() / scale.max()
    errdf = (np.abs(hdf64 - h_ref) / scale).max()
    assert errdf < 1e-10
    assert errdf < err32 / 1e3


def test_df64_hi_is_rounded_result(key, synth):
    """The hi word alone is the fp64 result correctly rounded to fp32."""
    src64, tar64, _ = synth(key, B, 4, 0.0, jnp.float64)
    h_ref = np.asarray(jit_of(aca)(src64, tar64))
    hdf = jit_of(aca_df64)(
        src64.astype(jnp.float32), tar64.astype(jnp.float32)
    )
    assert hdf.hi.dtype == jnp.float32
    # Inputs were rounded to fp32 first, so allow input-rounding noise relative
    # to the matrix scale — but hi must be far tighter than fp32 arithmetic.
    scale = np.abs(h_ref).max(axis=(-2, -1), keepdims=True)
    err = (np.abs(np.asarray(hdf.hi).astype(np.float64) - h_ref) / scale).max()
    assert err < 1e-4


def test_df64_jit_vmap_compose(key, synth):
    """DF is a pytree (NamedTuple of arrays): jit/vmap work unchanged."""
    src, tar, _ = synth(key, B, 4, 0.0, jnp.float32)
    f = jax.jit(jax.vmap(aca_df64))
    out = f(src, tar)
    assert isinstance(out, DF)
    assert out.hi.shape == (B, 3, 3)
    assert bool(jnp.all(jnp.isfinite(out.hi)))
