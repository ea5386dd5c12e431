"""Synthetic correspondence generation — the framework's test/bench fixtures.

Automates the reference's manual oracle (``Matlab Codes/veri_4Pts.m``: camera
intrinsics + extrinsics -> exact H -> projected points) and its benchmark input
synthesis (PyTorch square+jitter ``Modules_Runtime_Test.py:9-21``; CUDA
resampling of the wall fixture ``GPU_Runtime Test.cu:52-78``), as jit-friendly
``jax.random`` generators.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import Array

from sks_tpu.geom.homography import apply_homography, homography_from_pose

__all__ = [
    "random_rotation",
    "random_plane_homographies",
    "random_correspondences",
    "random_quad_pairs",
    "rect_offset_pairs",
]


def random_rotation(key: Array, batch: tuple = (), max_angle: float = 0.4,
                    dtype=jnp.float32) -> Array:
    """Small random rotations via axis-angle (Rodrigues), (..., 3, 3)."""
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (*batch, 3), dtype)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    ang = jax.random.uniform(k2, batch, dtype, -max_angle, max_angle)
    kx, ky, kz = axis[..., 0], axis[..., 1], axis[..., 2]
    z = jnp.zeros_like(kx)
    kmat = jnp.stack(
        [
            jnp.stack([z, -kz, ky], axis=-1),
            jnp.stack([kz, z, -kx], axis=-1),
            jnp.stack([-ky, kx, z], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.eye(3, dtype=dtype)
    s = jnp.sin(ang)[..., None, None]
    c = jnp.cos(ang)[..., None, None]
    return eye + s * kmat + (1 - c) * (kmat @ kmat)


def random_plane_homographies(
    key: Array, batch: tuple = (), focal: float = 600.0, dtype=jnp.float32
) -> Array:
    """Exact plane-induced homographies from random camera geometry, (..., 3, 3).

    Camera 1 at identity looking at the plane z = d; camera 2 randomly rotated
    and translated.  Every returned H is an exact homography (the oracle).
    """
    kr, kt, kd = jax.random.split(key, 3)
    k = jnp.array(
        [[focal, 0.0, 320.0], [0.0, focal, 240.0], [0.0, 0.0, 1.0]], dtype=dtype
    )
    k = jnp.broadcast_to(k, (*batch, 3, 3))
    r = random_rotation(kr, batch, 0.3, dtype)
    t = jax.random.uniform(kt, (*batch, 3), dtype, -0.5, 0.5)
    d = jax.random.uniform(kd, batch, dtype, 2.0, 6.0)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype), (*batch, 3))
    return homography_from_pose(k, k, r, t, n, d)


def random_correspondences(
    key: Array,
    batch: tuple = (),
    n_points: int = 4,
    noise: float = 0.0,
    dtype=jnp.float32,
):
    """(src, tar, H_true): exact-homography correspondences with optional noise.

    src points are drawn well-spread in a [0, 640) x [0, 480) image; tar is
    their exact image under a random plane-induced homography plus Gaussian
    noise of the given pixel sigma.
    """
    kh, kp, kn = jax.random.split(key, 3)
    h = random_plane_homographies(kh, batch, dtype=dtype)
    # Spread points: one per cell of a jittered grid to avoid near-degenerate quads.
    gx = math.ceil(math.sqrt(n_points))
    cells = jnp.stack(
        jnp.meshgrid(jnp.arange(gx, dtype=dtype), jnp.arange(gx, dtype=dtype)),
        axis=-1,
    ).reshape(-1, 2)[:n_points]
    jit_ = jax.random.uniform(kp, (*batch, n_points, 2), dtype, 0.15, 0.85)
    src = (cells + jit_) * jnp.array([640.0 / gx, 480.0 / gx], dtype)
    tar = apply_homography(h, src)
    if noise > 0:
        tar = tar + noise * jax.random.normal(kn, tar.shape, dtype)
    return src, tar, h


def random_quad_pairs(key: Array, batch: int, dtype=jnp.float32):
    """Random general-position 4-point pairs (the CUDA harness's input style)."""
    src, tar, _ = random_correspondences(key, (batch,), 4, 0.0, dtype)
    return src, tar


def rect_offset_pairs(
    key: Array, batch: tuple = (), size: float = 128.0, max_offset: float = 32.0,
    dtype=jnp.float32,
):
    """Deep-homography style input: rect corners + random corner offsets.

    Returns (origin, wh, tar) matching :func:`sks_tpu.ops.aca_rect` order.
    """
    ko, kd = jax.random.split(key)
    origin = jax.random.uniform(ko, (*batch, 2), dtype, 0.0, 32.0)
    wh = jnp.broadcast_to(jnp.array([size, size], dtype), (*batch, 2))
    from sks_tpu.ops.aca_rect import rect_corners

    corners = rect_corners(origin, wh)
    tar = corners + jax.random.uniform(
        kd, (*batch, 4, 2), dtype, 0.0, max_offset
    )
    return origin, wh, tar
