"""Benchmark harness: reference-comparable timing with honest JAX methodology."""

from sks_tpu.bench.harness import time_jitted, BenchResult  # noqa: F401
