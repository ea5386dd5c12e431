"""Utilities: synthetic data, timing, config."""
