"""The stack on the reference's REAL wall correspondences (SURVEY C4).

These tests read ``orig_pts_wall.txt`` from the reference checkout at
runtime (``sks_tpu.data.wall`` — nothing is copied into this repo) and
skip cleanly when no checkout is mounted.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sks_tpu.data.wall import load_wall, resample_quads

_wall = load_wall()

pytestmark = pytest.mark.skipif(
    _wall is None, reason="reference wall data not mounted "
    "(set SKS_WALL_POINTS or mount the reference checkout)")


def test_wall_loader_shape_and_range():
    src, tar = _wall
    assert src.shape == (2540, 2) and tar.shape == (2540, 2)
    # Reference coordinates span ~[7, 790] x [7, 631] (measured).
    for a in (src, tar):
        assert np.all(np.isfinite(a))
        assert a.min() > -1.0 and a.max() < 1000.0


def test_all_solvers_exact_on_real_quads():
    """f64 4-point solves on real wall quads are exact (CPU oracle)."""
    from sks_tpu.ops import SOLVERS

    src, tar = _wall
    sq, tq = resample_quads(src, tar, 512, seed=3)
    s = jnp.asarray(sq, jnp.float64)
    t = jnp.asarray(tq, jnp.float64)
    # Drop degenerate resamples (repeated point in a quad — the
    # reference-shaped `% size` builder draws them at ~0.2%).
    keep = np.array([len(set(map(tuple, q))) == 4 for q in sq])
    for name, fn in SOLVERS.items():
        h = jax.jit(fn)(s, t)
        proj = jnp.concatenate([s, jnp.ones_like(s[..., :1])], -1) @ \
            jnp.swapaxes(h, -1, -2)
        proj = proj[..., :2] / proj[..., 2:3]
        r = jnp.max(jnp.linalg.norm(proj - t, axis=-1), axis=-1)
        r = np.asarray(r)[keep]
        assert np.nanmedian(r) < 1e-6, (name, np.nanmedian(r))


def test_robust_fit_wall_parity():
    """find_homography on the full 2,540 real matches: a strong planar
    consensus exists (the wall facade) and, when cv2 is present, the two
    fits agree closely (the paper's own operating regime)."""
    from sks_tpu.bench.wall_real import robust_parity

    src, tar = _wall
    out = robust_parity(src, tar, threshold=3.0, seed=0)
    # The dominant plane holds >half the real matches.
    assert out["inliers_ours"] > 1200, out
    if "inliers_cv2" in out:
        assert out["inlier_jaccard"] > 0.9, out
        assert out["corner_transfer_disagreement_px"] < 5.0, out
