"""Geometry layer: homography action/inverse, Lie maps, pose recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import jit_of
from sks_tpu.geom.homography import (
    apply_homography,
    homography_from_pose,
    inv_h,
    normalize_h,
)
from sks_tpu.geom.lie import se3_exp, se3_log, sl3_exp, so3_exp, so3_log
from sks_tpu.geom.pose import decompose_homography, recover_pose

B = 16


def test_inv_h_roundtrip(key, synth):
    src, tar, h = synth(key, B, 4, 0.0, jnp.float64)
    hi = jit_of(inv_h)(h)
    prod = jit_of(lambda a, b: normalize_h(a @ b, "fro"))(h, hi)
    eye = normalize_h(jnp.broadcast_to(jnp.eye(3, dtype=h.dtype), h.shape), "fro")
    assert np.allclose(np.asarray(prod), np.asarray(eye), atol=1e-10)


def test_apply_homography_identity(key, synth):
    src, _, _ = synth(key, B, 8, 0.0, jnp.float64)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), (B, 3, 3))
    out = jit_of(apply_homography)(eye, src)
    assert np.allclose(np.asarray(out), np.asarray(src))


def test_so3_exp_log_roundtrip(key):
    # |w| must stay below pi for log(exp(w)) == w.
    d = jax.random.normal(key, (B, 3), jnp.float64)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    mag = jax.random.uniform(jax.random.fold_in(key, 1), (B, 1), jnp.float64, 0.0, 3.0)
    w = d * mag
    r = jit_of(so3_exp)(w)
    # Orthonormality + det 1.
    rtr = jnp.einsum("bij,bik->bjk", r, r)
    assert np.allclose(np.asarray(rtr), np.eye(3), atol=1e-12)
    assert np.allclose(np.asarray(jnp.linalg.det(r)), 1.0, atol=1e-12)
    w2 = jit_of(so3_log)(r)
    assert np.allclose(np.asarray(w), np.asarray(w2), atol=1e-9)


def test_se3_exp_log_roundtrip(key):
    xi = jax.random.normal(key, (B, 6), jnp.float64)
    g = jit_of(se3_exp)(xi)
    assert np.allclose(np.asarray(g[:, 3]), [0, 0, 0, 1])
    xi2 = jit_of(se3_log)(g)
    assert np.allclose(np.asarray(xi), np.asarray(xi2), atol=1e-9)


def test_sl3_exp_unit_det(key):
    x = jax.random.normal(key, (B, 8), jnp.float64) * 0.3
    h = jit_of(sl3_exp)(x)
    assert np.allclose(np.asarray(jnp.linalg.det(h)), 1.0, atol=1e-10)
    # Zero tangent -> identity.
    h0 = jit_of(sl3_exp)(jnp.zeros((1, 8), jnp.float64))
    assert np.allclose(np.asarray(h0[0]), np.eye(3), atol=1e-14)


def _camera_setup(key, dtype):
    """Known pose/plane -> exact pixel homography + in-plane correspondences."""
    from sks_tpu.utils.synth import random_rotation

    kr, kt = jax.random.split(key)
    k_mat = jnp.array(
        [[600.0, 0.0, 320.0], [0.0, 600.0, 240.0], [0.0, 0.0, 1.0]], dtype
    )
    r = random_rotation(kr, (B,), 0.3, dtype)
    t = jax.random.uniform(kt, (B, 3), dtype, -0.4, 0.4)
    d = jnp.full((B,), 3.0, dtype)
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dtype), (B, 3))
    h = homography_from_pose(k_mat, k_mat, r, t, n, d)
    return k_mat, r, t, d, n, h


def test_decompose_homography_recovers_pose(key):
    dtype = jnp.float64
    k_mat, r, t, d, n, h = _camera_setup(key, dtype)
    hn = jnp.linalg.inv(k_mat) @ h @ k_mat
    cands = jit_of(decompose_homography)(hn)
    # The true (R, t/d) must be among the four candidates.
    t_over_d = t / d[..., None]
    err_r = jnp.min(
        jnp.max(jnp.abs(cands["r"] - r[:, None]), axis=(-2, -1)), axis=-1
    )
    # t candidates are canonicalized by n_z>0 flip; compare up to sign.
    dt = jnp.minimum(
        jnp.max(jnp.abs(cands["t"] - t_over_d[:, None]), axis=-1),
        jnp.max(jnp.abs(cands["t"] + t_over_d[:, None]), axis=-1),
    )
    err_t = jnp.min(dt, axis=-1)
    assert float(jnp.max(err_r)) < 1e-6, float(jnp.max(err_r))
    assert float(jnp.max(err_t)) < 1e-6, float(jnp.max(err_t))


def test_recover_pose_cheirality(key, synth):
    """End-to-end: the selected candidate is a valid decomposition that passes
    cheirality; the twofold ambiguity of a single homography means the truth
    is selected only up to tie-breaking."""
    dtype = jnp.float64
    k_mat, r, t, d, n, h = _camera_setup(key, dtype)
    kp = jax.random.split(key, 2)[1]
    pts1 = jax.random.uniform(kp, (B, 32, 2), dtype, 100.0, 500.0)
    pts2 = apply_homography(h, pts1)
    r_b, t_b, n_b, score = jit_of(recover_pose)(h, k_mat, k_mat, pts1, pts2)
    # Every selected candidate must exactly re-compose the calibrated H:
    # Hn ∝ R + t n^T.
    hn = jnp.linalg.inv(k_mat) @ h @ k_mat
    recomposed = r_b + t_b[..., :, None] * n_b[..., None, :]
    a = normalize_h(hn, "fro")
    bb = normalize_h(recomposed, "fro")
    # Sign of fro-canonicalization can differ; compare up to sign.
    diff = jnp.minimum(
        jnp.max(jnp.abs(a - bb), axis=(-2, -1)),
        jnp.max(jnp.abs(a + bb), axis=(-2, -1)),
    )
    assert float(jnp.max(diff)) < 1e-8, float(jnp.max(diff))
    # All points pass cheirality for the winner.
    assert float(jnp.min(score)) > 0.99
    # The truth is among selections for a non-trivial fraction (ties split).
    err_r = jnp.max(jnp.abs(r_b - r), axis=(-2, -1))
    assert float(jnp.mean(err_r < 1e-6)) > 0.3


def test_lie_gradients_finite_f32_at_identity():
    """Regression: vjp through se3_log(se3_exp(dx)) at dx=0 in f32.

    The Taylor-switch floors used to be max(th2, 1e-16); the quotient-rule
    vjp of the untaken generic branch divides by the floor squared (and for
    the se3 V-matrix, cubed), which underflows f32 to 0 and NaNs the masked
    branch (0 * NaN = NaN through `where`).  Double-where (untaken branch at
    theta^2 = 1) keeps pose-graph GN finite in f32 — the chain-consistent
    zero-residual graph a VO pipeline hands it.
    """
    from sks_tpu.geom.lie import se3_exp, se3_log

    for dtype in (jnp.float32, jnp.float64):
        z = jnp.zeros(6, dtype)

        def f(dx):
            return se3_log(se3_exp(dx))

        _, vjp = jax.vjp(f, z)
        g = vjp(jnp.ones(6, dtype))[0]
        assert bool(jnp.all(jnp.isfinite(g))), dtype
