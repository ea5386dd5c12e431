"""Harris corner detection as pure convolutions (batched, static top-K)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array

__all__ = ["harris_response", "detect_corners"]


def _conv2(img: Array, kern: Array) -> Array:
    """'same' 2-D convolution of (..., H, W) with (kh, kw)."""
    batch = img.shape[:-2]
    h, w = img.shape[-2:]
    x = img.reshape(-1, 1, h, w)
    k = kern[None, None]
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(*batch, h, w)


def _gauss_kernel(sigma: float, radius: int, dtype) -> Array:
    x = jnp.arange(-radius, radius + 1, dtype=dtype)
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return g[:, None] * g[None, :]


def harris_response(img: Array, k: float = 0.04, sigma: float = 1.5) -> Array:
    """Harris corner response of (..., H, W) grayscale images."""
    dtype = img.dtype
    sobel_x = jnp.asarray(
        [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], dtype
    ) / 8.0
    ix = _conv2(img, sobel_x)
    iy = _conv2(img, sobel_x.T)
    g = _gauss_kernel(sigma, 3, dtype)
    sxx = _conv2(ix * ix, g)
    syy = _conv2(iy * iy, g)
    sxy = _conv2(ix * iy, g)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


@partial(jax.jit, static_argnames=("num_corners", "nms_radius", "border"))
def detect_corners(
    img: Array,
    num_corners: int = 512,
    nms_radius: int = 4,
    border: int = 16,
    k: float = 0.04,
):
    """Top-K Harris corners with non-max suppression (fixed output shape).

    Args:
      img: (H, W) grayscale.
      num_corners: static K; weaker slots are padded and masked out.

    Returns:
      (xy (K, 2) float32 [x, y], score (K,), valid (K,) bool).
    """
    h, w = img.shape[-2:]
    resp = harris_response(img, k)
    # NMS: keep strict local maxima over a (2r+1)^2 window.
    win = 2 * nms_radius + 1
    pooled = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (win, win), (1, 1), "SAME"
    )
    is_max = resp >= pooled
    # Suppress borders (descriptor support must fit).
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = (
        (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    )
    resp_sup = jnp.where(is_max & inside, resp, -jnp.inf)

    flat = resp_sup.reshape(-1)
    score, idx = jax.lax.top_k(flat, num_corners)
    yy = (idx // w).astype(jnp.float32)
    xx = (idx % w).astype(jnp.float32)
    valid = jnp.isfinite(score) & (score > 0)
    return jnp.stack([xx, yy], axis=-1), score, valid
