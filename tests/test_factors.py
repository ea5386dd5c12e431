"""Interpretable decomposition factors (ops/factors.py).

Checks the structural claims of the decomposition — each factor has its
advertised form and action — and that the factored product reproduces the
one-shot solver outputs exactly (parity with the MATLAB derivation scripts,
``Matlab Codes/SKS.m`` / ``ACA.m``).
"""

import jax.numpy as jnp
import numpy as np

from conftest import jit_of
from sks_tpu.geom.homography import apply_homography, normalize_h
from sks_tpu.ops import (
    aca,
    aca_factors,
    sks,
    sks_factors,
    sks_kernel_chain,
)

B = 16
TOL = {jnp.dtype("float32"): 2e-3, jnp.dtype("float64"): 1e-9}

_fro = jit_of(lambda h: normalize_h(h, "fro"))


def fro_close(h1, h2, tol):
    return np.allclose(np.asarray(_fro(h1)), np.asarray(_fro(h2)), atol=tol)


def test_sks_reconstruct_matches_solver(key, dtype, synth):
    src, tar, _ = synth(key, B, 4, 0.0, dtype)
    f = jit_of(sks_factors)(src, tar)
    h = jit_of(sks)(src, tar)
    assert fro_close(f.reconstruct(), h, TOL[dtype])


def test_aca_reconstruct_matches_solver(key, dtype, synth):
    src, tar, _ = synth(key, B, 4, 0.0, dtype)
    f = jit_of(aca_factors)(src, tar)
    h = jit_of(aca)(src, tar)
    assert fro_close(f.reconstruct(), h, TOL[dtype])


def test_sks_factor_structure(key, dtype, synth):
    """H_S1 sends anchors to (∓1, 0); H_K fixes (±1, 0); H_S2^{-1} returns them."""
    src, tar, _ = synth(key, B, 4, 0.0, dtype)
    f = jit_of(sks_factors)(src, tar)
    tol = 1e-4 if dtype == jnp.dtype("float32") else 1e-12

    anchors1 = src[:, :2]  # (B, 2, 2) = [M1, N1]
    canon = jnp.broadcast_to(
        jnp.asarray([[-1.0, 0.0], [1.0, 0.0]], dtype), (B, 2, 2)
    )
    got = jit_of(apply_homography)(f.h_s1, anchors1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(canon), atol=tol)

    # Kernel fixes the canonical anchor pair.
    fixed = jit_of(apply_homography)(f.h_k, canon)
    np.testing.assert_allclose(np.asarray(fixed), np.asarray(canon), atol=tol)

    # H_S2^{-1} maps the canonical pair back onto the target anchors.
    back = jit_of(apply_homography)(f.h_s2_inv, canon)
    scale = float(jnp.max(jnp.abs(tar)))
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(tar[:, :2]), atol=tol * scale
    )


def test_aca_factor_structure(key, dtype, synth):
    """H_A1 maps M,N,P to the canonical simplex; H_C fixes it (projectively)."""
    src, tar, _ = synth(key, B, 4, 0.0, dtype)
    f = jit_of(aca_factors)(src, tar)
    tol = 1e-4 if dtype == jnp.dtype("float32") else 1e-12

    simplex = jnp.broadcast_to(
        jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], dtype), (B, 3, 2)
    )
    got = jit_of(apply_homography)(f.h_a1, src[:, :3])
    np.testing.assert_allclose(np.asarray(got), np.asarray(simplex), atol=tol)

    fixed = jit_of(apply_homography)(f.h_c, simplex)
    np.testing.assert_allclose(np.asarray(fixed), np.asarray(simplex), atol=tol)

    back = jit_of(apply_homography)(f.h_a2_inv, simplex)
    scale = float(jnp.max(jnp.abs(tar)))
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(tar[:, :3]), atol=tol * scale
    )


def test_kernel_chain_product(key, dtype, synth):
    """H_E·H_T·H_G·H_E reproduces H_K exactly."""
    src, tar, _ = synth(key, B, 4, 0.0, dtype)
    f = jit_of(sks_factors)(src, tar)
    he, ht, hg, he2 = jit_of(sks_kernel_chain)(f.params)
    prod = he @ ht @ hg @ he2
    tol = 1e-5 if dtype == jnp.dtype("float32") else 1e-13
    np.testing.assert_allclose(
        np.asarray(prod), np.asarray(f.h_k), atol=tol * float(
            jnp.max(jnp.abs(f.h_k))
        )
    )


def test_kernel_params_match_core(key, dtype, synth):
    """params = (a, b, u, v) sit in the advertised kernel slots."""
    src, tar, _ = synth(key, 4, 4, 0.0, dtype)
    f = jit_of(sks_factors)(src, tar)
    a, b, u, v = (np.asarray(f.params[..., i]) for i in range(4))
    hk = np.asarray(f.h_k)
    np.testing.assert_allclose(hk[:, 0, 0], a)
    np.testing.assert_allclose(hk[:, 0, 1], b)
    np.testing.assert_allclose(hk[:, 0, 2], u)
    np.testing.assert_allclose(hk[:, 1], np.tile([0.0, 1.0, 0.0], (4, 1)))
    np.testing.assert_allclose(hk[:, 2, 0], u)
    np.testing.assert_allclose(hk[:, 2, 1], v)
    np.testing.assert_allclose(hk[:, 2, 2], a)
