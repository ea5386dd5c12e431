"""Deep-homography model: differentiable ACA-rect head, training reduces loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sks_tpu.models import HomographyNet, corner_loss, create_train_state, train_step
from sks_tpu.models.deep_homography import synth_training_batch
from sks_tpu.ops.aca_rect import aca_rect, rect_corners
from sks_tpu.geom.homography import apply_homography


def test_aca_rect_head_differentiable():
    """Gradients flow through the solver head to the offsets."""

    def loss(offsets):
        origin = jnp.zeros((2,))
        size = jnp.asarray([63.0, 63.0])
        corners = rect_corners(origin, size)
        h = aca_rect(corners + offsets, origin, size)
        warped = apply_homography(h, corners)
        return jnp.sum((warped - (corners + offsets)) ** 2)

    g = jax.grad(loss)(jnp.ones((4, 2)) * 3.0)
    assert g.shape == (4, 2)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_train_step_reduces_loss(key):
    model, state = create_train_state(key, image_size=64)
    pair, offsets = synth_training_batch(key, 16, 64)
    _, loss0 = train_step(model, state, pair, offsets)
    for i in range(30):
        state, loss = train_step(model, state, pair, offsets)
    assert float(loss) < float(loss0) * 0.7, (float(loss0), float(loss))


def test_model_homography_consistency(key):
    """model.homography == aca_rect(corners + predicted offsets)."""
    model, state = create_train_state(key, image_size=64)
    pair, _ = synth_training_batch(key, 4, 64)
    origin = jnp.zeros((4, 2))
    size = jnp.full((4, 2), 63.0)
    h = model.homography(state.params, pair, origin, size)
    off = model.apply(state.params, pair)
    h2 = aca_rect(rect_corners(origin, size) + off, origin, size)
    assert np.allclose(np.asarray(h), np.asarray(h2))


def test_warp_by_homography_identity_and_shift(key):
    """Identity H is a no-op; a pure translation H shifts the image."""
    from sks_tpu.models import warp_by_homography

    img = jax.random.uniform(key, (2, 16, 16, 3), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (2, 3, 3))
    out = warp_by_homography(img, eye)
    # bilinear_sample clips coords to w-1.001 => ~1e-3 blend at the last
    # row/col; exact elsewhere.
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=5e-3)

    # H = translate by (+2, 0): out(x, y) = img(x+2, y) on the interior.
    t = eye.at[:, 0, 2].set(2.0)
    out = warp_by_homography(img, t)
    np.testing.assert_allclose(
        np.asarray(out[:, :-1, :-2]), np.asarray(img[:, :-1, 2:]), atol=5e-3
    )


@pytest.mark.slow
def test_ihn_shapes_and_grads(key):
    """Sequence output shape, finite grads through all iterations."""
    from sks_tpu.models import create_ihn_state, sequence_loss

    model, state = create_ihn_state(key, image_size=32, iters=3)
    from sks_tpu.models.deep_homography import synth_training_batch

    pair, offsets = synth_training_batch(key, 2, 32, max_offset=4.0)
    seq = model.apply(state.params, pair)
    assert seq.shape == (3, 2, 4, 2)
    assert bool(jnp.all(jnp.isfinite(seq)))

    g = jax.grad(lambda p: sequence_loss(model.apply(p, pair), offsets))(
        state.params
    )
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_ihn_train_step_reduces_loss(key):
    from sks_tpu.models import create_ihn_state, ihn_train_step
    from sks_tpu.models.deep_homography import synth_training_batch

    model, state = create_ihn_state(key, image_size=32, iters=3)
    pair, offsets = synth_training_batch(key, 8, 32, max_offset=8.0)
    _, loss0 = ihn_train_step(model, state, pair, offsets)
    for _ in range(30):
        state, loss = ihn_train_step(model, state, pair, offsets)
    assert float(loss) < float(loss0) * 0.8, (float(loss0), float(loss))


def test_ihn_homography_matches_final_offsets(key):
    from sks_tpu.models import create_ihn_state

    model, state = create_ihn_state(key, image_size=32, iters=2)
    from sks_tpu.models.deep_homography import synth_training_batch

    pair, _ = synth_training_batch(key, 2, 32, max_offset=4.0)
    offsets = model.apply(state.params, pair)[-1]
    h = model.homography(state.params, pair)
    origin = jnp.zeros((2, 2), jnp.float32)
    size = jnp.full((2, 2), 31.0, jnp.float32)
    corners = rect_corners(origin, size)
    np.testing.assert_allclose(
        np.asarray(apply_homography(h, corners)),
        np.asarray(corners + offsets),
        atol=1e-3,
    )
