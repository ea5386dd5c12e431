"""3-point affine solver: exactness, degeneracy, and consistency with ACA.

The reference claims SKS/ACA handle affine transforms "in a unified way"
(``README.md:62-64``); here that is a first-class solver plus the check that
the general ACA 4-point solve of an affine-consistent quad recovers the same
map up to scale.
"""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import jit_of
from sks_tpu.geom.homography import apply_homography, normalize_h
from sks_tpu.ops import aca_h, affine_3pt, affine_3pt_h, affine_valid_mask

B = 32
_fro = jit_of(lambda h: normalize_h(h, "fro"))


def _random_affine_problem(key, dtype=jnp.float32):
    """Random non-degenerate affine map + 4 source points and exact targets."""
    k1, k2, k3 = jax.random.split(key, 3)
    lin = jax.random.uniform(k1, (B, 2, 2), dtype, -2.0, 2.0)
    det = lin[:, 0, 0] * lin[:, 1, 1] - lin[:, 0, 1] * lin[:, 1, 0]
    # Push determinants away from zero (keep sign).
    lin = lin * jnp.where(jnp.abs(det) < 0.3, 2.0, 1.0)[:, None, None]
    trans = jax.random.uniform(k2, (B, 1, 2), dtype, -50.0, 50.0)
    src = jax.random.uniform(k3, (B, 4, 2), dtype, -100.0, 100.0)
    tar = jnp.einsum("bij,bnj->bni", lin, src) + trans
    return src, tar, lin, trans


def test_affine_exact(key, dtype):
    src, tar, lin, trans = jit_of(
        lambda k: _random_affine_problem(k, dtype)
    )(key)
    h = jit_of(affine_3pt)(src[:, :3], tar[:, :3])
    tol = 1e-3 if dtype == jnp.float32 else 1e-9
    assert np.allclose(np.asarray(h[:, :2, :2]), np.asarray(lin), atol=tol)
    assert np.allclose(np.asarray(h[:, :2, 2]), np.asarray(trans[:, 0]), atol=tol * 100)
    assert np.allclose(np.asarray(h[:, 2]), [0.0, 0.0, 1.0], atol=tol)
    # The 4th point (not used by the solver) also maps exactly.
    mapped = apply_homography(h, src)
    assert np.allclose(np.asarray(mapped), np.asarray(tar), atol=0.05 if dtype == jnp.float32 else 1e-6)


def test_affine_agrees_with_aca(key):
    """General 4-point ACA on affine-consistent quads == affine_3pt up to scale."""
    src, tar, _, _ = jit_of(_random_affine_problem)(key)
    h_aff = jit_of(affine_3pt_h)(src[:, :3], tar[:, :3])
    h_aca = jit_of(aca_h)(src, tar)
    assert np.allclose(
        np.asarray(_fro(h_aff)), np.asarray(_fro(h_aca)), atol=2e-3
    )


def test_affine_valid_mask(key):
    src, _, _, _ = jit_of(_random_affine_problem)(key)
    ok = jit_of(affine_valid_mask)(src[:, :3])
    assert bool(jnp.all(ok))
    collinear = jnp.stack(
        [src[:, 0], src[:, 0] + 1.0, src[:, 0] + 2.0], axis=1
    )
    bad = jit_of(affine_valid_mask)(collinear)
    assert not bool(jnp.any(bad))


def test_affine_grad_finite(key):
    src, tar, _, _ = jit_of(_random_affine_problem)(key)

    def loss(s):
        h = affine_3pt(s, tar[:, :3])
        return jnp.sum(h * h)

    g = jit_of(jax.grad(loss))(src[:, :3])
    assert bool(jnp.all(jnp.isfinite(g)))
