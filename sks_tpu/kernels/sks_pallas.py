"""Pallas SKS kernel: batched solve in the same SoA layout as the ACA kernel.

SKS carries 5 intrinsic reciprocals per hypothesis (vs ACA's none up to
scale) — still VPU-cheap; the kernel stays bandwidth-bound at the same
16-in/9-out floats per hypothesis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sks_tpu.kernels.aca_pallas import LANES, from_soa_h, to_soa
from sks_tpu.ops.sks import sks_core

__all__ = ["sks_solve_soa", "sks_h_pallas"]


def _solve_kernel(chain_ref, src_ref, tar_ref, out_ref):
    # f32 compute regardless of storage dtype (see aca_pallas._solve_kernel).
    s = [src_ref[i].astype(jnp.float32) for i in range(8)]
    t = [tar_ref[i].astype(jnp.float32) for i in range(8)]
    s[0] = s[0] + chain_ref[0] * 1e-38
    h = sks_core(*s, *t)
    for i in range(9):
        out_ref[i] = h[i].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile",))
def sks_solve_soa(src: Array, tar: Array, chain: Array | None = None,
                  tile: int = 128) -> Array:
    """Batched SKS on SoA (8, M, 128) inputs -> (9, M, 128) homographies."""
    _, m, _ = src.shape
    tile = min(tile, m)
    assert m % tile == 0, (m, tile)
    if chain is None:
        chain = jnp.zeros((), jnp.float32)
    spec_in = pl.BlockSpec((8, tile, LANES), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((9, tile, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _solve_kernel,
        grid=(m // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec_in, spec_in],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((9, m, LANES), src.dtype),
        cost_estimate=pl.CostEstimate(
            flops=169 * m * LANES,
            bytes_accessed=(16 + 9) * m * LANES * src.dtype.itemsize,
            transcendentals=0,
        ),
    )(chain.astype(jnp.float32).reshape(1), src, tar)


def sks_h_pallas(src: Array, tar: Array) -> Array:
    """(B, 4, 2) convenience wrapper (AoS -> SoA -> solve -> AoS)."""
    return from_soa_h(sks_solve_soa(to_soa(src), to_soa(tar)))
