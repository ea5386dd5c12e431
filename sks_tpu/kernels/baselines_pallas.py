"""Pallas SoA kernels for the baseline solvers (GE, GPT, HO, NDLT).

Same layout contract as the ACA/SKS kernels (``aca_pallas``): a batch of B
hypotheses is component-major ``(8, M, 128)`` with ``M = B/128``, every
elementwise op runs on full ``(tile, 128)`` VPU tiles, 16 floats in / 9 out
per hypothesis.  The math bodies are the single-source component cores
(``ops/{ge,gpt,ho,ndlt}.py``) — the same straight-line graphs the XLA path
traces, here scheduled behind an explicit VMEM DMA pipeline.

This is the TPU answer to the reference batching *all six* solvers on GPU
(``GPU_Runtime Test.cu:359-507`` GE, ``:242-357`` GPT LU, ``:788-1031`` HO,
``:1034-1160`` NDLT, both on the per-thread Golub-Reinsch SVD ``:527-785``):
one lane = one hypothesis, no cross-lane traffic, branch-free numerics
(bubble-pass partial pivoting for GPT, fixed-sweep Jacobi for NDLT, closed
form 3x3 for HO) instead of the reference's data-dependent loops.

Default sublane tiles are tuned for live-value pressure: the GE body is as
lean as ACA's (tile 128); GPT carries a 72-entry tableau and NDLT a
162-component Jacobi state, so they run narrower tiles to stay in VMEM/VREGs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sks_tpu.kernels.aca_pallas import LANES, from_soa_h, to_soa
from sks_tpu.ops.ge import ge_core
from sks_tpu.ops.gpt import gpt_core
from sks_tpu.ops.ho import ho_core
from sks_tpu.ops.ndlt import ndlt_core

__all__ = [
    "ge_solve_soa",
    "gpt_solve_soa",
    "ho_solve_soa",
    "ndlt_solve_soa",
    "SOA_SOLVERS",
]


def _make_kernel(core):
    def kernel(chain_ref, src_ref, tar_ref, out_ref):
        # f32 compute regardless of storage dtype (see aca_pallas).
        s = [src_ref[i].astype(jnp.float32) for i in range(8)]
        t = [tar_ref[i].astype(jnp.float32) for i in range(8)]
        # Serialization hook for honest chained timing (sub-roundoff nudge).
        s[0] = s[0] + chain_ref[0] * 1e-38
        h = core(*s, *t)
        for i in range(9):
            out_ref[i] = h[i].astype(out_ref.dtype)

    return kernel


def _soa_solve(core, flops_per_h: int, default_tile: int):
    kernel = _make_kernel(core)

    @functools.partial(jax.jit, static_argnames=("tile",))
    def solve(src: Array, tar: Array, chain: Array | None = None,
              tile: int | None = None) -> Array:
        """(8, M, 128) SoA minimal sets -> (9, M, 128) homographies."""
        _, m, _ = src.shape
        tile = default_tile if tile is None else tile
        tile = min(tile, m)
        assert m % tile == 0, (m, tile)
        if chain is None:
            chain = jnp.zeros((), jnp.float32)
        spec_in = pl.BlockSpec((8, tile, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((9, tile, LANES), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(m // tile,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec_in, spec_in],
            out_specs=spec_out,
            out_shape=jax.ShapeDtypeStruct((9, m, LANES), src.dtype),
            cost_estimate=pl.CostEstimate(
                flops=flops_per_h * m * LANES,
                bytes_accessed=(16 + 9) * m * LANES * src.dtype.itemsize,
                transcendentals=0,
            ),
        )(chain.astype(jnp.float32).reshape(1), src, tar)

    return solve


#: Approximate per-hypothesis FLOPs (for the compiler's cost model):
#: GE ~250 (six shared-det Cramer solves + 2x2 coupling), GPT ~1500 (pivoted
#: 8x9 Gauss-Jordan incl. selection traffic), HO ~900 (normalization, two
#: 3x3 eliminations, closed-form eigensolver), NDLT ~15K (3-sweep Jacobi
#: seed + LDL^T shifted inverse iteration — measured equal-or-better than
#: the converged 6-sweep Jacobi at median/p99/p99.9; see
#: ops/linalg.invit_smallest_col_core).
ge_solve_soa = _soa_solve(ge_core, 250, 128)
gpt_solve_soa = _soa_solve(gpt_core, 1_500, 32)
# 'jacobi' for the 3x3 eigensolver: Mosaic has no acos/cos lowering, so the
# trigonometric closed form is XLA-only.
ho_solve_soa = _soa_solve(
    functools.partial(ho_core, eig_method="jacobi"), 1_200, 64
)
ndlt_solve_soa = _soa_solve(
    functools.partial(ndlt_core, eig="invit"), 15_000, 8
)

#: name -> SoA kernel, matching the SOLVERS_H naming.
SOA_SOLVERS = {
    "rho_ge": ge_solve_soa,
    "gpt_lu": gpt_solve_soa,
    "ho": ho_solve_soa,
    "ndlt": ndlt_solve_soa,
}


def baseline_h_pallas(name: str, src: Array, tar: Array) -> Array:
    """(B, 4, 2) convenience wrapper: AoS -> SoA -> solve -> AoS."""
    return from_soa_h(SOA_SOLVERS[name](to_soa(src), to_soa(tar)))
