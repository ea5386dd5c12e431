"""Native C++ runtime: parity with the JAX solvers, IO round trip, hot loop."""

import numpy as np
import pytest

from conftest import jit_of

pytestmark = pytest.mark.skipif(
    not __import__("sks_tpu.native", fromlist=["available"]).available(),
    reason="native lib not buildable",
)


def _pairs(key, b, dtype):
    import jax.numpy as jnp

    from sks_tpu.utils.synth import random_quad_pairs

    src, tar = jit_of(lambda k: random_quad_pairs(k, b, jnp.float32))(key)
    return np.asarray(src, dtype), np.asarray(tar, dtype)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_native_aca_matches_jax(key, dtype):
    import jax.numpy as jnp

    from sks_tpu.native import aca_batch
    from sks_tpu.ops import aca

    src, tar = _pairs(key, 64, dtype)
    h_native = aca_batch(src, tar)
    h_jax = np.asarray(jit_of(aca)(jnp.asarray(src), jnp.asarray(tar)))
    tol = 1e-3 if dtype == np.float32 else 1e-10
    assert np.allclose(h_native, h_jax, atol=tol, rtol=tol)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_native_sks_matches_jax(key, dtype):
    import jax.numpy as jnp

    from sks_tpu.native import sks_batch
    from sks_tpu.ops import sks

    src, tar = _pairs(key, 64, dtype)
    h_native = sks_batch(src, tar)
    h_jax = np.asarray(jit_of(sks)(jnp.asarray(src), jnp.asarray(tar)))
    tol = 2e-3 if dtype == np.float32 else 1e-10
    assert np.allclose(h_native, h_jax, atol=tol, rtol=tol)


def test_read_points_roundtrip(tmp_path):
    from sks_tpu.native import read_points

    rng = np.random.default_rng(0)
    src = rng.uniform(0, 640, (100, 2))
    tar = rng.uniform(0, 640, (100, 2))
    p = tmp_path / "pts.txt"
    with open(p, "w") as f:
        f.write("100\n")
        for (x1, y1), (x2, y2) in zip(src, tar):
            f.write(f"{x1:.6f} {y1:.6f} {x2:.6f} {y2:.6f}\n")
    s2, t2 = read_points(p)
    assert np.allclose(s2, src, atol=1e-5)
    assert np.allclose(t2, tar, atol=1e-5)


def test_hot_loop_runs(key):
    from sks_tpu.native import bench_hot_loop

    src, tar = _pairs(key, 1, np.float64)
    ns = bench_hot_loop("aca", src[0], tar[0], iters=100_000)
    assert 0.0 < ns < 10_000.0  # sane ns-per-solve


@pytest.mark.parametrize("alg,op", [
    ("ge", "rho_ge"), ("gpt", "gpt_lu"), ("ho", "ho"), ("ndlt", "ndlt"),
])
def test_native_baselines_match_jax(key, alg, op):
    """The four baseline kernels' native twins vs the f64 JAX ops."""
    import jax.numpy as jnp

    from sks_tpu.native import solve_batch
    from sks_tpu.ops import SOLVERS

    src, tar = _pairs(key, 64, np.float64)
    h_native = solve_batch(alg, src, tar)
    h_jax = np.asarray(jit_of(SOLVERS[op])(jnp.asarray(src), jnp.asarray(tar)))
    # Both normalized to H[2,2]=1; f64 end to end.
    assert np.allclose(h_native, h_jax, atol=1e-8, rtol=1e-8)
