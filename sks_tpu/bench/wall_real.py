"""The stack on the reference's REAL wall correspondences (closes C4).

Every accuracy claim so far rests on rendered/synthetic scenes; the
reference's own harnesses run on 2,540 real SIFT matches of a real wall
(``orig_pts_wall.txt``).  This benchmark grounds the TPU stack in that
exact data, read-only at runtime (``data/wall.py`` — nothing copied):

1. **Solver accuracy on real quads** — the reference-shaped resampling
   (``GPU_Runtime Test.cu:52-78``: random 4-point subsets) through ALL six
   solvers; per-solver max/median reprojection residual of the defining
   quad (exact-arithmetic zero; measures numerical conditioning on the
   real coordinate distribution) at f32 and df64, cross-checked against
   CPU f64.

2. **Throughput on real data** — the chained Pallas ACA at B=1M built from
   real resampled quads: same kernel, real inputs (TPU compute is
   data-independent; this pins that the headline number is not an artifact
   of synthetic input ranges).

3. **Robust fit parity** — ``find_homography`` (+ final polish) vs
   ``cv2.findHomography`` on the full 2,540 real matches: inlier counts
   under cv2's own forward rule, inlier-set Jaccard, and corner-transfer
   stability between the two models.  The wall is a real 3-D scene
   photographed from two views of a dominantly planar facade, so the
   inlier structure is the paper's own operating regime.

Run:  python -m sks_tpu.bench.wall_real [--out bench_results/WALL_REAL.json]
Skips cleanly (exit 0, message) when no reference checkout is mounted.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from sks_tpu.data.wall import load_wall, resample_quads
from sks_tpu.geom.homography import apply_homography
from sks_tpu.ops import SOLVERS

__all__ = ["solver_accuracy", "robust_parity", "run"]


def _quad_residual(h, src, tar):
    """Max reprojection error of the defining quad, (B,) per hypothesis."""
    proj = apply_homography(h, src)
    return jnp.max(jnp.linalg.norm(proj - tar, axis=-1), axis=-1)


def solver_accuracy(src, tar, batch: int = 4096, seed: int = 11) -> dict:
    """Per-solver residual stats on real resampled quads (f32 + df64)."""
    sq, tq = resample_quads(src, tar, batch, seed)
    out = {}
    s32 = jnp.asarray(sq, jnp.float32)
    t32 = jnp.asarray(tq, jnp.float32)
    # ~0.2% of reference-shaped resamples draw a repeated index (a
    # degenerate 4-point set — the reference's `% size` builder has the
    # same); residual stats are over the finite (non-degenerate) fits.
    for name, fn in SOLVERS.items():
        h = jax.jit(fn)(s32, t32)
        r = np.asarray(_quad_residual(h, s32, t32), np.float64)
        r[~np.isfinite(r)] = np.nan
        out[name] = {
            "f32_median_px": float(np.nanmedian(r)),
            "f32_p99_px": float(np.nanpercentile(r, 99)),
            "finite_frac": float(np.mean(np.isfinite(r))),
        }
    # df64 twins, all six solvers: compensated f32 pairs on TPU.
    from sks_tpu.ops.df64 import (
        aca_df64_h,
        ge_df64_h,
        gpt_df64_h,
        ho_df64_h,
        ndlt_df64_h,
        sks_df64_h,
    )

    for name, fn in (("aca", aca_df64_h), ("sks", sks_df64_h),
                     ("ndlt", ndlt_df64_h), ("rho_ge", ge_df64_h),
                     ("gpt_lu", gpt_df64_h), ("ho", ho_df64_h)):
        hi, lo = jax.jit(fn)(s32, t32)
        # Recombine hi+lo in HOST f64 (TPU has no f64) and normalize there.
        h = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        h = h / h[..., 2:3, 2:3]
        proj = np.concatenate([sq, np.ones_like(sq[..., :1])], -1) @ np.swapaxes(h, -1, -2)
        proj = proj[..., :2] / proj[..., 2:3]
        r = np.max(np.linalg.norm(proj - tq, axis=-1), axis=-1)
        r[~np.isfinite(r)] = np.nan
        out[name]["df64_median_px"] = float(np.nanmedian(r))
        out[name]["df64_p99_px"] = float(np.nanpercentile(r, 99))
    return out


def throughput_real(src, tar, batch: int = 1 << 20) -> dict | None:
    """Chained Pallas ACA H/s on REAL resampled quads (TPU only)."""
    if jax.default_backend() != "tpu":
        return None
    from sks_tpu.bench.chained import aca_pallas_chained, chained_step_seconds

    sq, tq = resample_quads(src, tar, batch)
    m = batch // 128
    s = jnp.asarray(sq.reshape(batch, 8).T.reshape(8, m, 128), jnp.float32)
    t = jnp.asarray(tq.reshape(batch, 8).T.reshape(8, m, 128), jnp.float32)
    jax.block_until_ready((s, t))
    sec = chained_step_seconds(aca_pallas_chained, s, t, k1=200, k2=1000)
    return {"batch": batch, "h_per_s": batch / sec,
            "note": "chained Pallas ACA on real resampled wall quads "
                    "(VMEM-resident regime)"}


def robust_parity(src, tar, threshold: float = 3.0, seed: int = 0) -> dict:
    """find_homography vs cv2.findHomography on the full real match set."""
    from sks_tpu.robust import find_homography

    a = np.asarray(src, np.float32)
    b = np.asarray(tar, np.float32)
    key = jax.random.PRNGKey(seed)
    h_ours, mask_ours = find_homography(
        jnp.asarray(a), jnp.asarray(b), method="ransac",
        ransac_reproj_threshold=threshold, max_iters=2048, key=key,
    )
    h_ours = np.asarray(h_ours, np.float64)

    out = {"matches": int(a.shape[0]), "threshold_px": threshold}

    def fwd_mask(h):
        p = np.concatenate([a, np.ones_like(a[:, :1])], 1) @ np.asarray(
            h, np.float64).T
        p = p[:, :2] / p[:, 2:3]
        return np.sum((p - b) ** 2, axis=1) < threshold * threshold

    m_ours = fwd_mask(h_ours)
    out["inliers_ours"] = int(m_ours.sum())
    out["inliers_ours_native_symmetric"] = int(np.asarray(mask_ours).sum())

    try:
        import cv2
    except ImportError:
        out["cv2"] = "unavailable"
        return out
    h_cv, mask_cv = cv2.findHomography(a, b, cv2.RANSAC, threshold,
                                       maxIters=2048, confidence=0.999)
    m_cv = fwd_mask(h_cv)
    inter = int((m_ours & m_cv).sum())
    union = max(int((m_ours | m_cv).sum()), 1)
    out["inliers_cv2"] = int(m_cv.sum())
    out["inlier_jaccard"] = inter / union

    # Corner-transfer stability: both models map the source data's bounding
    # box; their disagreement bounds the geometric difference of the fits.
    (x0, y0), (x1, y1) = a.min(0), a.max(0)
    corners = np.array([[x0, y0], [x1, y0], [x0, y1], [x1, y1],
                        [(x0 + x1) / 2, (y0 + y1) / 2]], np.float64)

    def tx(h, p):
        q = np.concatenate([p, np.ones_like(p[:, :1])], 1) @ np.asarray(
            h, np.float64).T
        return q[:, :2] / q[:, 2:3]

    out["corner_transfer_disagreement_px"] = float(np.max(
        np.linalg.norm(tx(h_ours, corners) - tx(h_cv, corners), axis=-1)))
    return out


def run(out_path: str | None = None, batch: int = 4096) -> dict | None:
    data = load_wall()
    if data is None:
        print("no reference checkout mounted (orig_pts_wall.txt absent; "
              "set SKS_WALL_POINTS) — skipping")
        return None
    src, tar = data
    result = {
        "source": "reference orig_pts_wall.txt (read-only at runtime)",
        "n_matches": int(src.shape[0]),
        "backend": jax.default_backend(),
        "solver_accuracy_on_real_quads": solver_accuracy(src, tar, batch),
        "robust_parity_full_set": robust_parity(src, tar),
    }
    tp = throughput_real(src, tar)
    if tp:
        result["throughput_real_quads"] = tp
    print(json.dumps(result, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        print("wrote", out_path)
        if out_path.endswith(".json"):
            md = out_path[:-5] + ".md"
            with open(md, "w") as f:
                f.write(to_markdown(result) + "\n")
            print("wrote", md)
    return result


def to_markdown(res: dict) -> str:
    sa = res["solver_accuracy_on_real_quads"]
    rp = res["robust_parity_full_set"]
    lines = [
        "# WALL_REAL — the stack on the reference's real wall matches "
        "(closes SURVEY C4)",
        "",
        f"2,540 real SIFT correspondences (`orig_pts_wall.txt`, read-only "
        f"at runtime — nothing copied), backend: {res['backend']}.",
        "",
        "## Solver accuracy on reference-shaped resampled real quads",
        "",
        "Max reprojection residual of the defining quad (exact-arithmetic "
        "zero; measures conditioning on the real coordinate distribution).",
        "",
        "| solver | f32 median px | f32 p99 px | df64 median px |",
        "|---|---|---|---|",
    ]
    for name, row in sa.items():
        dfm = row.get("df64_median_px")
        lines.append(
            f"| {name} | {row['f32_median_px']:.2e} "
            f"| {row['f32_p99_px']:.2e} "
            f"| {f'{dfm:.1e}' if dfm is not None else '-'} |")
    lines += [
        "",
        "The df64 rows bottom out at ~6e-5 px *identically* across solvers: "
        "that is the f32 INPUT quantization of the real f64 coordinates "
        "(2^-23 x ~640 px = 7.6e-5), not solver error — the df64 "
        "arithmetic is exact relative to its inputs (7e-11 px on exact-f32 "
        "synthetic quads, DF64_TABLE8.json).",
    ]
    lines += [
        "",
        "## Robust fit on the full 2,540 real matches vs cv2",
        "",
        f"- inliers (cv2 forward rule, 3 px): ours **{rp['inliers_ours']}** "
        f"vs cv2 **{rp.get('inliers_cv2', '-')}**",
        f"- inlier-set Jaccard: **{rp.get('inlier_jaccard', 0):.3f}**",
        f"- corner-transfer disagreement over the data bounding box: "
        f"**{rp.get('corner_transfer_disagreement_px', 0):.2f} px**",
    ]
    tp = res.get("throughput_real_quads")
    if tp:
        lines += [
            "",
            "## Throughput on real resampled quads",
            "",
            f"Chained Pallas ACA at B={tp['batch']:,}: "
            f"**{tp['h_per_s']:.3e} H/s** — matching the synthetic headline "
            "(TPU compute is input-independent; this pins that the Table-8 "
            "numbers are not an artifact of synthetic input ranges).",
        ]
    return "\n".join(lines)


def main(argv=None):
    """Console entry point (``python -m sks_tpu.bench.wall_real``)."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args(argv)
    run(args.out, args.batch)


if __name__ == "__main__":
    main()
