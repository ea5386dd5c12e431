"""Deep homography regression with a differentiable ACA-rect solver head.

Pipeline (the unsupervised/IHN-style deep-homography shape the reference's
tensor solvers serve): stacked image pair -> small CNN -> 4 corner offsets ->
:func:`sks_tpu.ops.aca_rect` -> H.  The solver head is closed-form and
division-free up to scale, so gradients flow through ~50 flops instead of a
linear-system solve (the reference's TensorDLT head backprops through
``torch.inverse`` of an 8x8; ACA-rect is the paper's headline win for exactly
this use).

Training step is pure optax/flax and shards over the batch (DP) on a mesh —
exercised by the driver's multi-chip dry run.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax
from jax import Array

from sks_tpu.geom.homography import apply_homography
from sks_tpu.ops.aca_rect import aca_rect, rect_corners

__all__ = ["HomographyNet", "corner_loss", "create_train_state", "train_step"]


class HomographyNet(nn.Module):
    """Small conv regressor: (B, H, W, 2) stacked pair -> (B, 4, 2) offsets."""

    features: tuple = (32, 64, 128)
    max_offset: float = 32.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for f in self.features:
            x = nn.Conv(f, (3, 3), strides=(2, 2), dtype=x.dtype)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(256, dtype=x.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(8, dtype=x.dtype)(x)
        return self.max_offset * jnp.tanh(x).reshape(-1, 4, 2)

    def homography(self, params, pair: Array, origin: Array, size: Array):
        """Predict H mapping the source rect to the target quad."""
        offsets = self.apply(params, pair)
        corners = rect_corners(origin, size)
        return aca_rect(corners + offsets, origin, size)


def corner_loss(offsets_pred: Array, offsets_true: Array) -> Array:
    """Mean corner error (the standard deep-homography supervision)."""
    d = offsets_pred - offsets_true
    return jnp.mean(jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12))


@dataclass
class TrainState:
    params: Any
    opt_state: Any

    def tree_flatten(self):
        return (self.params, self.opt_state), None

    @classmethod
    def tree_unflatten(cls, aux, c):
        return cls(*c)


jax.tree_util.register_pytree_node_class(TrainState)

_TX = optax.adam(1e-4)


def create_train_state(key: Array, image_size: int = 64,
                       dtype=jnp.float32) -> tuple[HomographyNet, TrainState]:
    model = HomographyNet()
    params = model.init(key, jnp.zeros((1, image_size, image_size, 2), dtype))
    return model, TrainState(params, _TX.init(params))


@partial(jax.jit, static_argnames=("model",))
def train_step(model: HomographyNet, state: TrainState, pair: Array,
               offsets_true: Array):
    """One supervised step; batch dim shards over a mesh for DP."""

    def loss_fn(params):
        pred = model.apply(params, pair)
        return corner_loss(pred, offsets_true)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = _TX.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state), loss


def synth_training_batch(key: Array, batch: int, image_size: int = 64,
                         max_offset: float = 16.0, dtype=jnp.float32):
    """Self-supervised data: warp random images by known corner offsets.

    Returns (pair (B, S, S, 2), offsets (B, 4, 2)).  The second channel is the
    first image warped by the homography induced by the offsets — exactly the
    signal the net must invert.
    """
    k1, k1b, k2 = jax.random.split(key, 3)
    # Multi-scale value noise, not per-pixel white noise: warps of white
    # noise alias away all correspondence signal, making the inverse problem
    # near-unlearnable.  Coarse structure + fine detail is what real imagery
    # offers the net.
    coarse = jax.random.uniform(k1, (batch, 8, 8), dtype)
    fine = jax.random.uniform(k1b, (batch, 24, 24), dtype)
    img = (
        2.0 * jax.image.resize(coarse, (batch, image_size, image_size),
                               "linear")
        + jax.image.resize(fine, (batch, image_size, image_size), "linear")
    ) / 3.0
    offsets = jax.random.uniform(k2, (batch, 4, 2), dtype, -max_offset, max_offset)
    origin = jnp.zeros((batch, 2), dtype)
    size = jnp.full((batch, 2), float(image_size - 1), dtype)
    h = aca_rect(rect_corners(origin, size) + offsets, origin, size)

    # Inverse-warp with bilinear sampling (vmapped gather).
    ys = jnp.arange(image_size, dtype=dtype)
    xs = jnp.arange(image_size, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)  # (S*S, 2)
    src_pts = apply_homography(jnp.linalg.inv(h), grid)  # (B, S*S, 2)

    from sks_tpu.features.descriptors import bilinear_sample

    warped = jax.vmap(bilinear_sample)(img, src_pts).reshape(
        batch, image_size, image_size
    )
    pair = jnp.stack([img, warped], axis=-1)
    return pair, offsets
