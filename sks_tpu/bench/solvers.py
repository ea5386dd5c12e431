"""Solver benchmark sweeps — the reference-comparable configuration.

Reproduces the shape of the reference's GPU Table 8 (``imgs/GPU-runtime.png``,
BASELINE.md): per-batch latency of each solver at B in {1, 10, ..., 1M}, on
whatever backend JAX selected.  Inputs are random general-position quads
(regenerated per sweep, not the reference's single cache-hot hypothesis —
SURVEY.md §2.4 notes that methodology bug).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sks_tpu.bench.harness import BenchResult, time_jitted
from sks_tpu.ops import SOLVERS_H
from sks_tpu.utils.synth import random_quad_pairs

__all__ = ["bench_solver", "sweep", "REFERENCE_B_SWEEP"]

REFERENCE_B_SWEEP = (1, 10, 100, 1_000, 10_000, 100_000, 1_000_000)


def bench_solver(
    name: str,
    batch: int,
    dtype=jnp.float32,
    seed: int = 0,
    budget_s: float = 2.0,
) -> BenchResult:
    """Time one solver at one batch size (solve only, H materialized)."""
    key = jax.random.PRNGKey(seed)
    src, tar = random_quad_pairs(key, batch, dtype)
    fn = jax.jit(SOLVERS_H[name])
    return time_jitted(fn, src, tar, budget_s=budget_s)


def sweep(
    names=("aca", "sks", "rho_ge", "gpt_lu", "ho", "ndlt"),
    batches=REFERENCE_B_SWEEP,
    dtype=jnp.float32,
    budget_s: float = 1.0,
):
    """Full Table-8-shaped sweep. Returns {name: {B: BenchResult}}."""
    out = {}
    for name in names:
        out[name] = {}
        for b in batches:
            out[name][b] = bench_solver(name, b, dtype, budget_s=budget_s)
    return out
