"""Solver heads: offsets -> H, all methods consistent and differentiable.

Parity with the reference's tensor-head benchmark matrix
(``PyTorch Codes/Modules_Runtime_Test.py``: TensorDLT/TensorGE/TensorACA_rect).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import jit_of
from sks_tpu.geom.homography import apply_homography, normalize_h
from sks_tpu.models import HEAD_METHODS, offsets_to_h
from sks_tpu.ops.aca_rect import rect_corners

B = 8

_fro = jit_of(lambda h: normalize_h(h, "fro"))


def _setup(key, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    origin = jax.random.uniform(k1, (B, 2), dtype, 0.0, 64.0)
    size = jax.random.uniform(k2, (B, 2), dtype, 32.0, 128.0)
    offsets = jax.random.uniform(k3, (B, 4, 2), dtype, -16.0, 16.0)
    return offsets, origin, size


@pytest.mark.parametrize("method", sorted(HEAD_METHODS))
def test_head_maps_corners(method, key):
    offsets, origin, size = _setup(key)
    h = jit_of(lambda o, og, sz: offsets_to_h(o, og, sz, method))(
        offsets, origin, size
    )
    corners = rect_corners(origin, size)
    got = jit_of(apply_homography)(h, corners)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(corners + offsets), atol=5e-3
    )


@pytest.mark.slow
def test_heads_agree(key):
    offsets, origin, size = _setup(key)
    hs = {
        m: np.asarray(
            _fro(
                jit_of(lambda o, og, sz, m=m: offsets_to_h(o, og, sz, m))(
                    offsets, origin, size
                )
            )
        )
        for m in sorted(HEAD_METHODS)
    }
    ref = hs["aca_rect"]
    for m, h in hs.items():
        np.testing.assert_allclose(h, ref, atol=5e-4, err_msg=m)


@pytest.mark.parametrize("method", [
    m if m != "ndlt" else pytest.param(m, marks=pytest.mark.slow)
    for m in sorted(HEAD_METHODS)
])
def test_head_gradients_finite(method, key):
    """Every head backprops finite gradients to the offsets (training use)."""
    offsets, origin, size = _setup(key)

    def loss(o):
        h = offsets_to_h(o, origin, size, method)
        return jnp.sum(h * h)

    g = jit_of(jax.grad(loss))(offsets)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_unnormalized_aca_rect_proportional(key):
    offsets, origin, size = _setup(key)
    hn = jit_of(lambda o, og, sz: offsets_to_h(o, og, sz, "aca_rect"))(
        offsets, origin, size
    )
    hu = jit_of(
        lambda o, og, sz: offsets_to_h(o, og, sz, "aca_rect", normalize=False)
    )(offsets, origin, size)
    np.testing.assert_allclose(
        np.asarray(_fro(hu)), np.asarray(_fro(hn)), atol=1e-5
    )
