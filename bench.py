#!/usr/bin/env python
"""Headline benchmark: batched ACA homography throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's CUDA ACA at B=1M runs 245 us per batch on the paper's
GPU (BASELINE.md, Table 8) => ~4.08e9 homographies/s — the number this
TPU-native batched ACA competes with.

Methodology: device-side chained loop (see sks_tpu/bench/chained.py) — K
serialized kernel invocations in one dispatch, two-point K fit to cancel
dispatch overhead.  Honest steady-state: same work per step as the reference's
CUDA kernel (16 floats in, 9 out per hypothesis, full HBM round trip).
"""

import json
import sys

BASELINE_H_PER_S = 1_000_000 / 245e-6  # reference CUDA ACA @ B=1M


def main():
    import jax
    import jax.numpy as jnp

    from sks_tpu.bench.chained import (
        aca_pallas_chained,
        aca_xla_chained,
        chained_step_seconds,
    )
    from sks_tpu.utils.synth import random_quad_pairs

    batch = 1 << 20
    m = batch // 128
    key = jax.random.PRNGKey(0)
    src, tar = jax.jit(
        lambda k: random_quad_pairs(k, batch, jnp.float32)
    )(key)
    s = jax.jit(lambda x: x.reshape(batch, 8).T.reshape(8, m, 128))(src)
    t = jax.jit(lambda x: x.reshape(batch, 8).T.reshape(8, m, 128))(tar)
    jax.block_until_ready((s, t))

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        sec = chained_step_seconds(aca_pallas_chained, s, t)
    else:
        sec = chained_step_seconds(aca_xla_chained, s, t, k1=20, k2=100)

    hps = batch / sec
    print(
        json.dumps(
            {
                "metric": "aca_homographies_per_sec_per_chip",
                "value": hps,
                "unit": "H/s",
                "vs_baseline": hps / BASELINE_H_PER_S,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
