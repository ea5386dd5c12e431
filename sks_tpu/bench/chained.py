"""Chained steady-state device timing — the honest methodology for this box.

Repeatedly dispatching the *same* computation is untrustworthy here (the
device relay dedupes/batches identical executions; host RTT is ~30 ms), so
per-call timing uses a device-side loop instead: K kernel invocations chained
by a scalar data dependency (one dispatch, forced serialization, zero extra
HBM traffic), timed at two K values to cancel the fixed dispatch overhead:

    t(K) = overhead + K * t_step   =>   t_step = (t(K2) - t(K1)) / (K2 - K1)

The scalar readback (`float(...)`) forces real completion.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

from sks_tpu.kernels.aca_pallas import LANES, aca_solve_soa
from sks_tpu.ops.aca import aca_core

__all__ = ["chained_step_seconds", "aca_pallas_chained", "aca_xla_chained",
           "aca_pallas_chained_rotating"]


@partial(jax.jit, static_argnames=("k", "tile"))
def aca_pallas_chained(s, t, k: int, tile: int = 128):
    """K chained Pallas ACA solves; returns a checksum scalar."""
    m = s.shape[1]

    def body(_, carry):
        return aca_solve_soa(s, t, chain=carry[8, 0, 0], tile=tile)

    out = jax.lax.fori_loop(
        0, k, body, jnp.zeros((9, m, LANES), s.dtype)
    )
    return jnp.sum(out[8])


@partial(jax.jit, static_argnames=("k", "tile"))
def aca_pallas_chained_rotating(s_all, t_all, k: int, tile: int = 128):
    """K chained solves over R ROTATING distinct input/output buffer sets.

    The fully-streamed variant (VERDICT r3 item 8): step i reads input set
    ``i % R`` and writes output slot ``i % R`` of an (R, 9, m, 128) carry.
    With R sized so inputs + outputs far exceed VMEM, every step's 64 MB of
    reads AND 36 MB of writes must traverse HBM — unlike the fixed-buffer
    chain, where XLA can pin the output block in VMEM and the implied
    "full round trip" bandwidth exceeds the physical spec (the round-3
    artifact's 1020 GB/s > 819 GB/s spec impossibility).

    Args:
      s_all, t_all: (R, 8, m, 128) distinct SoA input sets.

    Returns a checksum scalar (forces completion on readback).
    """
    r, _, m, lanes = s_all.shape

    def body(i, carry):
        idx = i % r
        s = jax.lax.dynamic_index_in_dim(s_all, idx, keepdims=False)
        t_ = jax.lax.dynamic_index_in_dim(t_all, idx, keepdims=False)
        dep = jax.lax.dynamic_index_in_dim(carry, idx, keepdims=False)[8, 0, 0]
        h = aca_solve_soa(s, t_, chain=dep, tile=tile)
        return jax.lax.dynamic_update_index_in_dim(carry, h, idx, axis=0)

    out = jax.lax.fori_loop(
        0, k, body, jnp.zeros((r, 9, m, lanes), s_all.dtype)
    )
    return jnp.sum(out[:, 8, 0, 0])


@partial(jax.jit, static_argnames=("k",))
def aca_xla_chained(s, t, k: int):
    """XLA-fused (non-Pallas) equivalent, same SoA layout."""
    m = s.shape[1]

    def body(_, carry):
        s0 = [s[i] for i in range(8)]
        s0[0] = s0[0] + carry[8, 0, 0] * 1e-38
        h = aca_core(*s0, *[t[i] for i in range(8)])
        return jnp.stack(h)

    out = jax.lax.fori_loop(
        0, k, body, jnp.zeros((9, m, LANES), s.dtype)
    )
    return jnp.sum(out[8])


def chained_step_seconds(fn, s, t, k1: int = 200, k2: int = 1000,
                         repeats: int = 3) -> float:
    """Per-invocation seconds from the two-point K fit (best of repeats)."""

    def run(k):
        float(fn(s, t, k))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(fn(s, t, k))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run(k1)
    t2 = run(k2)
    return max((t2 - t1) / (k2 - k1), 1e-9)
