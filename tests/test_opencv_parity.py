"""Inlier parity with OpenCV findHomography (BASELINE.json config 3).

The reference's solvers are adapted *from* OpenCV, so OpenCV's RANSAC is the
natural external oracle: on the wall fixture (0.6 px noise, 15% outliers) our
vectorized RANSAC must find essentially the same model and inlier set as
``cv2.findHomography(..., cv2.RANSAC)``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from sks_tpu.data.fixture import load_correspondences
from sks_tpu.geom.homography import apply_homography
from sks_tpu.robust import RansacConfig, ransac_homography


@pytest.fixture(scope="module")
def wall():
    src, tar = load_correspondences()
    return src.astype(np.float32), tar.astype(np.float32)


def test_inlier_parity_with_opencv(key, wall):
    src, tar = wall
    thr = 3.0

    h_cv, mask_cv = cv2.findHomography(src, tar, cv2.RANSAC, thr)
    mask_cv = mask_cv.ravel().astype(bool)

    config = RansacConfig(num_hypotheses=4096, threshold=thr, solver="aca")
    res = ransac_homography(key, jnp.asarray(src), jnp.asarray(tar), config)
    mask_jx = np.asarray(res.inlier_mask)

    # Inlier sets agree on >= 97% of points. (Thresholding semantics differ
    # slightly: cv2 uses forward reprojection, ours symmetric transfer — a few
    # boundary points may flip.)
    agree = (mask_cv == mask_jx).mean()
    assert agree > 0.97, agree
    # Inlier counts within 5%.
    assert abs(mask_cv.sum() - mask_jx.sum()) < 0.05 * mask_cv.sum()

    # The two models agree to sub-pixel over the image.
    corners = np.array(
        [[0, 0], [640, 0], [0, 480], [640, 480]], np.float64
    )
    ours = np.asarray(
        apply_homography(jnp.asarray(res.h, jnp.float64), jnp.asarray(corners))
    )
    ones = np.ones((4, 1))
    proj = np.concatenate([corners, ones], 1) @ h_cv.T
    theirs = proj[:, :2] / proj[:, 2:]
    assert np.max(np.abs(ours - theirs)) < 1.0


def test_solver_matches_getPerspectiveTransform(key, wall):
    """4-point GPT-LU == cv2.getPerspectiveTransform (same algorithm)."""
    from sks_tpu.ops import gpt_lu

    src, tar = wall
    rng = np.random.default_rng(5)
    corners = np.array([[0, 0], [640, 0], [0, 480], [640, 480]], np.float64)
    ones = np.ones((4, 1))
    for _ in range(8):
        idx = rng.choice(len(src), 4, replace=False)
        s4 = src[idx].astype(np.float64)
        t4 = tar[idx].astype(np.float64)
        # cv2's API takes f32 points (it solves in f64 internally); feed our
        # solver the identical f32-rounded values.
        s4 = s4.astype(np.float32).astype(np.float64)
        t4 = t4.astype(np.float32).astype(np.float64)
        h_cv = cv2.getPerspectiveTransform(s4.astype(np.float32),
                                           t4.astype(np.float32))
        h_jx = np.asarray(
            gpt_lu(jnp.asarray(s4, jnp.float64), jnp.asarray(t4, jnp.float64))
        )
        # Compare as warps (entry-wise comparison is meaningless on
        # ill-conditioned quads where both answers are legitimate).
        ours = np.asarray(
            apply_homography(jnp.asarray(h_jx), jnp.asarray(corners))
        )
        proj = np.concatenate([corners, ones], 1) @ h_cv.T
        theirs = proj[:, :2] / proj[:, 2:]
        # f32 input rounding on a random quad can move the extrapolated
        # corners by a few px; the medians below stay ~1e-2.
        assert np.max(np.abs(ours - theirs)) < 5.0, np.max(np.abs(ours - theirs))
