"""Geometry layer: homography action, errors, pose recovery, Lie groups."""

from sks_tpu.geom.homography import (  # noqa: F401
    apply_homography,
    reprojection_error,
    symmetric_transfer_error,
    homography_from_pose,
    normalize_h,
)
