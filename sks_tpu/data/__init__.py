"""Data fixtures: correspondence files in the reference text format."""

from sks_tpu.data.fixture import load_correspondences, make_fixture  # noqa: F401
