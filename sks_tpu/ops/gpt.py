"""GPT-LU — 4-point homography via the 8x8 linear system (batched).

Capability parity with ``cv::runKernel_GPT`` (``C++ Codes/modules/GPT.cpp:51-72``,
OpenCV ``getPerspectiveTransform``) and the CUDA per-thread LU
(``GPU_Runtime Test.cu:242-357``): build ``A h = b`` with
``h = (h1..h8)``, ``h9 = 1`` fixed, and solve by LU with partial pivoting —
here a statically unrolled, branch-free Gauss-Jordan that vectorizes over the
batch (:func:`sks_tpu.ops.linalg.solve_unrolled`).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from sks_tpu.ops.linalg import solve_unrolled

__all__ = ["gpt_lu", "build_gpt_system"]


def build_gpt_system(src: Array, tar: Array):
    """The classic getPerspectiveTransform 8x8 system.

    Rows i in 0..3:   [x, y, 1, 0, 0, 0, -x X, -y X] . h = X
    Rows i in 4..7:   [0, 0, 0, x, y, 1, -x Y, -y Y] . h = Y
    """
    x, y = src[..., 0], src[..., 1]
    xp, yp = tar[..., 0], tar[..., 1]
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    top = jnp.stack([x, y, one, zero, zero, zero, -x * xp, -y * xp], axis=-1)
    bot = jnp.stack([zero, zero, zero, x, y, one, -x * yp, -y * yp], axis=-1)
    a = jnp.concatenate([top, bot], axis=-2)  # (..., 8, 8)
    b = jnp.concatenate([xp, yp], axis=-1)  # (..., 8)
    return a, b


def gpt_lu(src: Array, tar: Array, method: str = "unrolled") -> Array:
    """4-point homography with ``H[2,2] == 1`` by construction.

    Args:
      src, tar: (..., 4, 2).
      method: 'unrolled' (branch-free pivoted Gauss-Jordan) or 'lax'
        (XLA's batched ``jnp.linalg.solve``).

    Returns:
      (..., 3, 3).
    """
    a, b = build_gpt_system(src, tar)
    if method == "unrolled":
        h8 = solve_unrolled(a, b, pivot=True)
    elif method == "lax":
        h8 = jnp.linalg.solve(a, b[..., None])[..., 0]
    else:
        raise ValueError(f"unknown method {method!r}")
    one = jnp.ones_like(h8[..., :1])
    h = jnp.concatenate([h8, one], axis=-1)
    return h.reshape(*h.shape[:-1], 3, 3)
