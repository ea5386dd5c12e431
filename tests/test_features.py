"""Feature pipeline: detection localizes corners; matching survives warps."""

import jax
import jax.numpy as jnp
import numpy as np

from sks_tpu.features import detect_corners, match_frames, patch_descriptors
from sks_tpu.features.matching import match_descriptors


def _checker(size=128, cell=16, dtype=jnp.float32):
    ys, xs = jnp.meshgrid(jnp.arange(size), jnp.arange(size), indexing="ij")
    return (((ys // cell) + (xs // cell)) % 2).astype(dtype)


def test_detect_corners_on_checkerboard():
    img = _checker()
    xy, score, valid = detect_corners(img, num_corners=64, border=8)
    k = int(valid.sum())
    assert k >= 20, k
    # Valid detections lie near cell intersections (multiples of 16).
    pts = np.asarray(xy)[np.asarray(valid)]
    off = np.minimum(pts % 16, 16 - (pts % 16)).max(axis=-1)
    assert np.median(off) <= 2.0, np.median(off)


def test_descriptors_match_under_shift():
    key = jax.random.PRNGKey(0)
    big = jax.random.uniform(key, (160, 160), jnp.float32)
    img1 = big[:128, :128]
    img2 = big[7:135, 11:139]  # pure translation (dx=11, dy=7 in img1 coords)
    pts1, pts2, valid = match_frames(img1, img2, num_corners=128)
    assert int(valid.sum()) > 20
    d = np.asarray(pts1 - pts2)[np.asarray(valid)]
    # Matches should consistently recover the translation.
    med = np.median(d, axis=0)
    assert np.allclose(med, [11.0, 7.0], atol=1.0), med


def test_match_descriptors_identity():
    key = jax.random.PRNGKey(1)
    d = jax.random.normal(key, (64, 32), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    idx, valid = match_descriptors(d, d, ratio=0.95)
    assert np.array_equal(np.asarray(idx), np.arange(64))
    assert bool(valid.all())


def test_end_to_end_homography_from_images():
    """detect+match feeds RANSAC: recover a known translation homography."""
    from sks_tpu.robust import RansacConfig, ransac_homography

    key = jax.random.PRNGKey(2)
    big = jax.random.uniform(key, (200, 200), jnp.float32)
    img1 = big[:128, :128]
    img2 = big[5:133, 9:137]
    pts1, pts2, valid = match_frames(img1, img2, num_corners=256)
    config = RansacConfig(num_hypotheses=256, threshold=2.0, refine_iters=1)
    res = ransac_homography(key, pts1, pts2, config, point_mask=valid)
    h = np.asarray(res.h)
    assert abs(h[0, 2] - (-9.0)) < 0.5, h  # x' = x - 9
    assert abs(h[1, 2] - (-5.0)) < 0.5, h
    assert abs(h[0, 0] - 1.0) < 0.01
