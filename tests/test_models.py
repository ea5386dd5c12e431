"""Deep-homography model: differentiable ACA-rect head, training reduces loss."""

import jax
import jax.numpy as jnp
import numpy as np

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
