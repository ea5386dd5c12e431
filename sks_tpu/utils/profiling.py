"""Profiling and tracing helpers.

Rebuild of SURVEY.md §5 "tracing/profiling": the reference's three ad-hoc
timers become (a) the honest bench harness (``sks_tpu.bench``), (b) these
``jax.profiler`` wrappers for device traces, and (c) XLA cost analysis hooks
that replace the reference's hand-maintained FLOP comments.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["device_trace", "cost_analysis", "annotate"]


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/sks_tpu_trace"):
    """Capture a device profile (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for host-side phases."""
    return jax.profiler.TraceAnnotation(name)


def cost_analysis(fn, *args):
    """XLA's cost analysis for ``jit(fn)(*args)``: flops, bytes accessed.

    Replaces the reference's inline FLOP comments with compiler-reported
    numbers; compare against ``sks_tpu.utils.flops.FLOPS``.
    """
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # some backends return one dict per computation
        ca = ca[0] if ca else {}
    return ca


def wall(fn, *args, repeats: int = 3):
    """Cheap wall-time of a blocking call (compile excluded)."""
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best
