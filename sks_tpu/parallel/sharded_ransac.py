"""RANSAC sharded over a device mesh.

Hypotheses are embarrassingly parallel (the scaling axis the reference pushes
to B=1M on one GPU, SURVEY.md §5 "long-context" analogue): each device draws
and scores its own slice of the hypothesis budget against the (replicated,
small) correspondence set; the consensus is a pmax + masked psum broadcast —
two tiny ICI collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sks_tpu.ops import SOLVERS_H, aca_valid_mask
from sks_tpu.robust.ransac import (
    RansacConfig,
    RansacResult,
    sample_minimal_sets,
    score_hypotheses,
)

__all__ = ["sharded_ransac_homography"]


def sharded_ransac_homography(
    mesh: Mesh,
    key: Array,
    src: Array,
    tar: Array,
    config: RansacConfig = RansacConfig(),
    axis: str = "hyp",
    fused: bool = False,
) -> RansacResult:
    """RANSAC with the hypothesis batch sharded across ``mesh[axis]``.

    ``config.num_hypotheses`` is the *global* budget; each device runs
    ``B / n_devices`` hypotheses.  Deterministic: per-device streams are
    ``fold_in(key, device_index)``, so the set of hypotheses is a pure function
    of (key, mesh size).

    ``fused=True`` runs the per-device solve+score through the Pallas fused
    kernel (see :func:`sks_tpu.robust.ransac_homography_fused` for its
    constraints: ACA, inlier scoring, local batch % 128 == 0, N in SMEM) —
    the multi-chip production configuration: per-device hypotheses never
    leave VMEM; only the consensus rides ICI.

    Returns a replicated RansacResult (identical on every device).
    """
    n_dev = mesh.shape[axis]
    assert config.num_hypotheses % n_dev == 0, (config.num_hypotheses, n_dev)
    b_local = config.num_hypotheses // n_dev
    n = src.shape[-2]
    solver = SOLVERS_H[config.solver]
    if fused:
        assert config.solver == "aca" and config.scoring == "inliers", (
            "fused path supports solver='aca', scoring='inliers'")
        assert b_local % 128 == 0, (b_local,)

    def shard_fn(key, src, tar):
        dev = jax.lax.axis_index(axis)
        k = jax.random.fold_in(key, dev)
        idx = sample_minimal_sets(k, n, b_local)
        s4 = jnp.take(src, idx, axis=0)
        t4 = jnp.take(tar, idx, axis=0)
        if fused:
            from sks_tpu.kernels.aca_pallas import aca_solve_score_soa, to_soa

            pts = jnp.concatenate([src.T, tar.T], axis=0)
            t2 = jnp.asarray(config.threshold**2, src.dtype)
            counts = aca_solve_score_soa(to_soa(s4), to_soa(t4), pts, t2)
            best = jnp.argmax(counts.reshape(-1))
            best_h = solver(s4[best], t4[best])
            scores1, inl1 = score_hypotheses(
                best_h[None], src, tar, config.threshold, None, "inliers"
            )
            best_score = scores1[0]
            best_inl = inl1[0]
        else:
            h = solver(s4, t4)
            if config.solver in ("aca", "sks"):
                valid = aca_valid_mask(s4, t4)
                h = jnp.where(valid[..., None, None], h, jnp.nan)
            scores, inl = score_hypotheses(
                h, src, tar, config.threshold, None, config.scoring
            )
            best = jnp.argmax(scores)
            best_score = scores[best]
            best_h = h[best]
            best_inl = inl[best]

        gmax = jax.lax.pmax(best_score, axis)
        mine = best_score >= gmax
        winner = jax.lax.pmin(
            jnp.where(mine, dev, jnp.asarray(n_dev, jnp.int32)), axis
        )
        sel = (dev == winner).astype(best_h.dtype)
        h_out = jax.lax.psum(best_h * sel, axis)
        inl_out = jax.lax.psum(best_inl.astype(jnp.int32) * sel.astype(jnp.int32), axis) > 0
        return h_out, inl_out, gmax

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,  # outputs are replicated via psum/pmax, not inferred
    )
    h_best, inl_best, score_best = fn(key, src, tar)

    if config.refine_iters > 0:
        from sks_tpu.robust.ransac import _irls_refine

        h_ref = _irls_refine(
            h_best, src, tar, inl_best, config.refine_iters, config.threshold
        )
        sc, inl_ref = score_hypotheses(
            h_ref[None], src, tar, config.threshold, None, config.scoring
        )
        better = sc[0] >= score_best
        h_best = jnp.where(better, h_ref, h_best)
        inl_best = jnp.where(better, inl_ref[0], inl_best)
        score_best = jnp.maximum(sc[0], score_best)

    h_best = h_best / h_best[2, 2]
    return RansacResult(
        h=h_best,
        inlier_mask=inl_best,
        num_inliers=jnp.sum(inl_best).astype(jnp.int32),
        score=score_best,
    )
