"""Pallas df64 solver kernels: fp64-grade solves with VMEM-resident chains
for all six solvers (ACA, SKS, NDLT, GE, GPT, HO).

The XLA df64 path (`bench/df64_table.py`, `df64_soa_chained`) runs the
~1,500-flop double-word ACA chain at only ~1 TFLOP/s — the long error-free
transformation chains (~200 live (M, 128) intermediates) break XLA's fusion
and round-trip HBM between fusions.  This kernel runs the IDENTICAL
dtype-polymorphic cores (`ops/aca.aca_core`, `ops/sks.sks_core` on
`ops/df64.DF` pairs — single source, no re-derivation) inside one Pallas
tile, so every intermediate lives in VMEM/registers and the chain is
flop-bound, not fusion-bound.

All DF primitive ops are elementwise add/sub/mul/div/select (`_pin` is a
`where(x == x, x, nan)` barrier), so Mosaic lowers the whole chain directly.

Output layout: (18, M, 128) — 9 `hi` components then 9 `lo` components,
normalized by h22 in df64 (reference fp64-kernel semantics,
`GPU_Runtime Test.cu:81-240`).  `hi` alone is the correctly-rounded fp32
homography; `hi + lo` carries ~49 bits (fp64 has 53).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sks_tpu.kernels.aca_pallas import LANES
from sks_tpu.ops.aca import aca_core
from sks_tpu.ops.df64 import DF
from sks_tpu.ops.sks import sks_core

__all__ = ["df64_solve_soa", "DF64_SOLVER_FLOPS"]

#: Approximate flops per hypothesis for the cost model: each df64 op is an
#: error-free transformation of ~10-20 f32 flops over the cores
#: (~100-160 ops for ACA/SKS; NDLT = f32 Jacobi seed + df64 normal-matrix
#: build + LDL^T inverse iteration, ~40K f32 flops total; GE a 250-op
#: Cramer chain; GPT a pivoted 8x8 Gauss-Jordan; HO normalization +
#: reduced 3x3 inverse iteration + back-substitution).
DF64_SOLVER_FLOPS = {"aca": 2_000, "sks": 3_500, "ndlt": 40_000,
                     "ge": 5_000, "gpt": 30_000, "ho": 20_000}

_CORES = {"aca": aca_core, "sks": sks_core}


def _ndlt_core_df(*args):
    from sks_tpu.ops.ndlt import ndlt_core

    # df_eig='invit': f32 Jacobi seed + df64 LDL^T inverse iteration —
    # ~1/40 the df64 ops of the 8-sweep df64 Jacobi this kernel ran before,
    # same direction accuracy (tests/test_df64.py pins both paths vs f64).
    return ndlt_core(*args, df_eig="invit")


def _ge_core_df(*args):
    from sks_tpu.ops.ge import ge_core

    return ge_core(*args)


def _gpt_core_df(*args):
    from sks_tpu.ops.gpt import gpt_core

    return gpt_core(*args)


def _ho_core_df(*args):
    from sks_tpu.ops.ho import ho_core

    # The DF branch solves the reduced 3x3 eigenproblem by LDL^T inverse
    # iteration regardless of eig_method (no trig for Mosaic to reject).
    return ho_core(*args)


_CORES["ndlt"] = _ndlt_core_df
_CORES["ge"] = _ge_core_df
_CORES["gpt"] = _gpt_core_df
_CORES["ho"] = _ho_core_df

#: Per-kind default sublane tile: the long df64 chains (NDLT's 9x9 normal
#: matrix + LDL^T factors, GPT's 8x9 tableau) hold many live (tile, 128)
#: pairs, so their tiles are small.
_DEFAULT_TILE = {"aca": 16, "sks": 16, "ndlt": 16, "ge": 16, "gpt": 8,
                 "ho": 16}


def _make_kernel(core):
    def kernel(chain_ref, src_ref, tar_ref, out_ref):
        def lift(ref, i):
            x = ref[i].astype(jnp.float32)
            return DF(x, jnp.zeros_like(x))

        s = [lift(src_ref, i) for i in range(8)]
        t = [lift(tar_ref, i) for i in range(8)]
        # Serialization hook for honest chained timing (sub-roundoff nudge).
        s[0] = s[0] + chain_ref[0] * 1e-38
        h = core(*s, *t)
        h = [e / h[8] for e in h]  # df64 normalization (h22 == 1)
        for i in range(9):
            out_ref[i] = h[i].hi.astype(out_ref.dtype)
            out_ref[9 + i] = h[i].lo.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("kind", "tile"))
def df64_solve_soa(src: Array, tar: Array, chain: Array | None = None,
                   kind: str = "aca", tile: int | None = None) -> Array:
    """Batched df64 homography solve on SoA inputs, one VMEM-resident kernel.

    Args:
      src, tar: (8, M, 128) component-major minimal sets (f32).
      chain: optional f32 scalar serialization hook (None -> 0).
      kind: 'aca', 'sks', or 'ndlt' (block-structured normal matrix +
        lane-parallel 9x9 Jacobi, all in df64 — the full 4-pt NDLT).
      tile: sublane tile; the df64 chains keep hundreds of live
        (tile, 128) f32 temporaries, so defaults are smaller than the f32
        kernels' (see ``_DEFAULT_TILE``).

    Returns:
      (18, M, 128): rows 0..8 the `hi` words, 9..17 the `lo` words of the
      h22-normalized homography components.
    """
    kernel = _make_kernel(_CORES[kind])
    _, m, _ = src.shape
    if tile is None:
        tile = _DEFAULT_TILE[kind]
    tile = min(tile, m)
    assert m % tile == 0, (m, tile)
    if chain is None:
        chain = jnp.zeros((), jnp.float32)
    spec_in = pl.BlockSpec((8, tile, LANES), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((18, tile, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(m // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec_in, spec_in],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((18, m, LANES), src.dtype),
        cost_estimate=pl.CostEstimate(
            flops=DF64_SOLVER_FLOPS[kind] * m * LANES,
            bytes_accessed=(16 + 18) * m * LANES * src.dtype.itemsize,
            transcendentals=0,
        ),
    )(chain.astype(jnp.float32).reshape(1), src, tar)
