"""CPU latency table — the reference Table 5 configuration.

Reproduces the shape of ``imgs/CPU-runtime.png`` (BASELINE.md): mean time per
4-point solve, single core, cache-hot 10M-iteration loop.  All six solvers
run through the native C++ hot loop (the honest analogue of the reference's
MSVC build; each kernel mirrors the repo's own ops/ derivation — see
``native/src/sks_native.cpp``).  The JAX-CPU batched per-solve cost is also
reported for the linear-algebra baselines as a cross-check (marked ``jax``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["cpu_table"]

# Reference Table 5 at /O2, microseconds per solve (BASELINE.md).
REFERENCE_US = {
    ("aca", "f32"): 0.0145,
    ("aca", "f64"): 0.0171,
    ("sks", "f32"): 0.0252,
    ("sks", "f64"): 0.0256,
    ("rho_ge", "f32"): 0.0287,
    ("gpt_lu", "f64"): 0.732,
    ("ho", "f64"): 12.2,
    ("ndlt", "f64"): 12.5,
}


def cpu_table(iters: int = 2_000_000, batch: int = 4096) -> dict:
    """Returns {(solver, dtype): {'us': measured, 'ref_us': Table5, 'mode': ...}}."""
    from sks_tpu.data.fixture import load_correspondences
    from sks_tpu.native import available, bench_hot_loop

    src_all, tar_all = load_correspondences()
    rng = np.random.default_rng(3)
    idx = rng.choice(len(src_all), 4, replace=False)
    src4 = src_all[idx].astype(np.float64)
    tar4 = tar_all[idx].astype(np.float64)

    # Map native kernel name -> roster name.
    native_ref = {
        "aca": "aca", "sks": "sks", "ge": "rho_ge",
        "gpt": "gpt_lu", "ho": "ho", "ndlt": "ndlt",
    }
    out = {}
    if available():
        for alg, ref_name in native_ref.items():
            # The slow solvers get proportionally fewer hot-loop iterations
            # (the reference runs 10M across the board, but its NDLT cell
            # alone is 125 s; scale to keep the suite minutes, precision ok).
            scale = {"ho": 10, "ndlt": 100, "gpt": 10}.get(alg, 1)
            for dt, npdt in (("f32", np.float32), ("f64", np.float64)):
                # Best-of-3: the box is a shared 2-vCPU VM; single runs jitter.
                ns = min(
                    bench_hot_loop(alg, src4.astype(npdt), tar4.astype(npdt),
                                   max(iters // scale, 10_000))
                    for _ in range(3)
                )
                out[(ref_name, dt)] = {
                    "us": ns / 1e3,
                    "ref_us": REFERENCE_US.get((ref_name, dt)),
                    "mode": "native-hot-loop",
                }

    # JAX CPU batched per-solve cost for the linear-algebra baselines.
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu":
        return out
    import time

    from sks_tpu.ops import SOLVERS_H

    k = jax.random.PRNGKey(0)
    from sks_tpu.utils.synth import random_quad_pairs

    src, tar = jax.jit(lambda k: random_quad_pairs(k, batch, jnp.float32))(k)
    for name in ("rho_ge", "gpt_lu", "ho", "ndlt"):
        fn = jax.jit(SOLVERS_H[name])
        jax.block_until_ready(fn(src, tar))
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            outp = fn(src, tar)
        jax.block_until_ready(outp)
        per = (time.perf_counter() - t0) / reps / batch
        key_dt = "f32" if name == "rho_ge" else "f64"
        out[(name, "f32/jax")] = {
            "us": per * 1e6,
            "ref_us": REFERENCE_US.get((name, key_dt)),
            "mode": "jax-cpu-batched",
        }
    return out


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    table = cpu_table()
    print(f"{'solver':10} {'dtype':5} {'us/solve':>10} {'ref us':>8}  mode")
    for (alg, dt), row in sorted(table.items()):
        ref = f"{row['ref_us']:.4f}" if row["ref_us"] else "-"
        print(f"{alg:10} {dt:5} {row['us']:10.4f} {ref:>8}  {row['mode']}")
