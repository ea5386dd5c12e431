"""Normalized patch descriptors via bilinear gathers (batched, fixed shape)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array

__all__ = ["patch_descriptors", "bilinear_sample"]


def bilinear_sample(img: Array, xy: Array) -> Array:
    """Bilinear sample (H, W) image at (..., 2) [x, y] locations."""
    h, w = img.shape[-2:]
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    def at(yy, xx):
        return img[yy, xx]

    v00 = at(y0, x0)
    v01 = at(y0, x1)
    v10 = at(y1, x0)
    v11 = at(y1, x1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


@partial(jax.jit, static_argnames=("patch", "stride"))
def patch_descriptors(img: Array, xy: Array, patch: int = 8, stride: int = 2):
    """Mean/variance-normalized intensity-patch descriptors.

    Args:
      img: (H, W) grayscale.
      xy: (K, 2) keypoint centers [x, y].
      patch: descriptor grid side (patch x patch samples).
      stride: pixel spacing of the sampling grid.

    Returns:
      (K, patch*patch) L2-normalized descriptors.
    """
    half = (patch - 1) / 2.0
    g = (jnp.arange(patch, dtype=img.dtype) - half) * stride
    gy, gx = jnp.meshgrid(g, g, indexing="ij")
    offs = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)  # (P^2, 2)
    pts = xy[:, None, :] + offs[None, :, :]  # (K, P^2, 2)
    vals = bilinear_sample(img, pts)  # (K, P^2)
    mu = vals.mean(axis=-1, keepdims=True)
    vals = vals - mu
    nrm = jnp.sqrt(jnp.sum(vals * vals, axis=-1, keepdims=True) + 1e-8)
    return vals / nrm
