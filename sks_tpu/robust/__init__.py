"""Robust estimation: fixed-shape vectorized RANSAC / MAGSAC over batched solvers."""

from sks_tpu.robust.api import find_homography  # noqa: F401
from sks_tpu.robust.ransac import (  # noqa: F401
    RansacConfig,
    RansacResult,
    ransac_homography,
    ransac_homography_adaptive,
    ransac_homography_fused,
    sample_minimal_sets,
    score_hypotheses,
)
