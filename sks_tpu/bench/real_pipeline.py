"""Image-grounded end-to-end benchmark: inlier parity vs cv2 + VO ATE.

Closes the BASELINE configs the synthetic harnesses cannot (real-style
pixels in, homography/trajectory out).  Two stages, one CLI:

1. **Pair parity** — P rendered planar pairs (``data/images.planar_pair``:
   textured plane, exact GT homography, photometric nuisances).  The feature
   pipeline (pyramid Harris + oriented patches + mutual-NN/ratio matching)
   produces *image-derived* matches; ``find_homography`` and
   ``cv2.findHomography`` run on the SAME matches at the same threshold and
   are scored per pair on (a) inlier-set agreement and (b) max corner error
   vs the exact GT H.  This plays the role the reference's real wall scene
   plays for its harnesses (``main.cpp:21-30`` sampling
   ``orig_pts_wall.txt``), with the GT the wall scene lacks.

2. **Sequence ATE** — a T-frame rendered plane sweep
   (``data/images.planar_sequence``); matches between consecutive frames feed
   ``slam.odometry.vo_trajectory`` (homography chain -> pose), and absolute
   trajectory error is computed against the exact GT poses.

Run:  python -m sks_tpu.bench.real_pipeline [--pairs 8] [--frames 12]
      [--out bench_results/REAL_PIPELINE.json]
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from sks_tpu.data.images import planar_pair, planar_sequence
from sks_tpu.features.matching import match_frames_oriented
from sks_tpu.geom.homography import apply_homography
from sks_tpu.robust import find_homography

__all__ = ["pair_parity", "sequence_ate", "run"]


def _corner_err(h, h_true, shape) -> float:
    hh, ww = shape
    corners = jnp.asarray(
        [[0.0, 0.0], [ww, 0.0], [0.0, hh], [ww, hh]], jnp.float32
    )
    d = apply_homography(h, corners) - apply_homography(h_true, corners)
    return float(jnp.max(jnp.linalg.norm(d, axis=-1)))


def pair_parity(seed: int, num_pairs: int = 8, shape=(480, 640),
                threshold: float = 3.0, method: str = "ransac",
                texture: str = "procedural"):
    """Per-pair inlier parity of find_homography vs cv2.findHomography.

    ``texture='photo'`` renders every pair from a real photograph
    (``data/images.photo_texture``) instead of the procedural plane — the
    HPatches ``v_*`` viewpoint protocol (one real planar scene, many camera
    poses), so real photographic pixels flow through detection, description,
    matching, and the robust fit.
    """
    import cv2

    tex = None
    if texture == "photo":
        from sks_tpu.data.images import photo_texture

        tex = photo_texture(shape)
        if tex is None:
            raise RuntimeError("no bundled photograph available "
                               "(PIL or matplotlib sample data missing)")
    rows = []
    for i in range(num_pairs):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        img1, img2, h_true = planar_pair(key, shape, texture=tex)
        p1, p2, valid, _ = match_frames_oriented(img1, img2, 512, 3)
        v = np.asarray(valid)
        a = np.asarray(p1)[v]
        b = np.asarray(p2)[v]
        if a.shape[0] < 8:
            rows.append({"pair": i, "matches": int(a.shape[0]),
                         "skipped": "too few matches"})
            continue

        h_ours, mask_ours = find_homography(
            jnp.asarray(a), jnp.asarray(b), method=method,
            ransac_reproj_threshold=threshold, max_iters=2048,
            key=jax.random.fold_in(key, 99),
        )
        mask_ours = np.asarray(mask_ours)

        h_cv, mask_cv = cv2.findHomography(
            a, b, cv2.RANSAC, threshold, maxIters=2048, confidence=0.999
        )
        mask_cv = mask_cv.reshape(-1).astype(bool)

        # Same-rule parity: our native mask is *symmetric*-transfer (stricter
        # than cv2's forward-only reprojection rule), so raw mask agreement
        # systematically undercounts.  Score both fitted models under cv2's
        # own forward rule for the apples-to-apples number.
        def fwd_mask(h):
            h = np.asarray(h, np.float64)
            p = np.concatenate([a, np.ones_like(a[:, :1])], axis=1) @ h.T
            p = p[:, :2] / p[:, 2:3]
            return np.sum((p - b) ** 2, axis=1) < threshold * threshold

        m_ours_fwd = fwd_mask(h_ours)
        m_cv_fwd = fwd_mask(h_cv)
        agree = float(np.mean(m_ours_fwd == m_cv_fwd))
        inter = np.sum(m_ours_fwd & m_cv_fwd)
        union = max(int(np.sum(m_ours_fwd | m_cv_fwd)), 1)
        rows.append({
            "pair": i,
            "matches": int(a.shape[0]),
            "inliers_ours": int(m_ours_fwd.sum()),
            "inliers_cv2": int(m_cv_fwd.sum()),
            "inliers_ours_native_symmetric": int(mask_ours.sum()),
            "inliers_cv2_native": int(mask_cv.sum()),
            "inlier_agreement": agree,
            "inlier_jaccard": float(inter / union),
            "corner_err_ours_px": _corner_err(h_ours, h_true, shape),
            "corner_err_cv2_px": _corner_err(
                jnp.asarray(h_cv, jnp.float32), h_true, shape),
        })
    return rows


def sequence_ate(seed: int, num_frames: int = 12, shape=(240, 320),
                 threshold: float = 2.0):
    """ATE of the VO chain on a rendered plane sweep vs exact GT poses."""
    from sks_tpu.robust.ransac import RansacConfig
    from sks_tpu.slam.odometry import vo_trajectory

    key = jax.random.PRNGKey(seed)
    frames, poses_gt, k_mat = planar_sequence(key, num_frames, shape)

    p1s, p2s, masks = [], [], []
    for i in range(num_frames - 1):
        p1, p2, valid, _ = match_frames_oriented(
            frames[i], frames[i + 1], 384, 2
        )
        p1s.append(p1)
        p2s.append(p2)
        masks.append(valid)
    p1s = jnp.stack(p1s)
    p2s = jnp.stack(p2s)
    masks = jnp.stack(masks)
    # Neutral padding (image center, zero motion): masked out of RANSAC
    # scoring by point_mask; harmless to the cheirality vote.
    center = jnp.asarray([shape[1] / 2.0, shape[0] / 2.0], jnp.float32)
    p1s = jnp.where(masks[..., None], p1s, center)
    p2s = jnp.where(masks[..., None], p2s, center)

    config = RansacConfig(num_hypotheses=2048, threshold=threshold,
                          refine_iters=3)
    out = vo_trajectory(
        jax.random.fold_in(key, 7), p1s, p2s, k_mat, config,
        plane_depth=3.0, point_mask=masks,
    )
    pos = np.asarray(out["poses"][:, :3, 3])
    pos_gt = np.asarray(poses_gt[:, :3, 3])
    ate_rmse = float(np.sqrt(np.mean(np.sum((pos - pos_gt) ** 2, axis=-1))))
    path_len = float(np.sum(np.linalg.norm(np.diff(pos_gt, axis=0), axis=-1)))
    return {
        "frames": num_frames,
        "ate_rmse": ate_rmse,
        "path_length": path_len,
        "ate_pct_of_path": 100.0 * ate_rmse / max(path_len, 1e-9),
        "mean_inliers": float(np.mean(np.asarray(out["num_inliers"]))),
    }


def run(seed: int = 0, num_pairs: int = 8, num_frames: int = 12,
        texture: str = "procedural"):
    pairs = pair_parity(seed, num_pairs, texture=texture)
    scored = [r for r in pairs if "skipped" not in r]
    ate = sequence_ate(seed, num_frames)
    summary = {
        "texture": texture,
        "pairs": pairs,
        "pair_summary": {
            "n": len(scored),
            "mean_inlier_agreement": float(
                np.mean([r["inlier_agreement"] for r in scored])),
            "mean_inlier_jaccard": float(
                np.mean([r["inlier_jaccard"] for r in scored])),
            "mean_corner_err_ours_px": float(
                np.mean([r["corner_err_ours_px"] for r in scored])),
            "mean_corner_err_cv2_px": float(
                np.mean([r["corner_err_cv2_px"] for r in scored])),
        },
        "sequence": ate,
    }
    return summary


if __name__ == "__main__":
    import argparse

    # The pipeline is feature-bound and parity/ATE are hardware-independent;
    # run hermetically on the CPU backend (the committed artifacts are CPU —
    # and per-match host readbacks would bottleneck on a relayed TPU).
    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--texture", choices=("procedural", "photo"),
                    default="procedural",
                    help="'photo' renders pairs from a real photograph "
                         "(bundled grace_hopper.jpg)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    summary = run(args.seed, args.pairs, args.frames, texture=args.texture)
    print(json.dumps(summary["pair_summary"], indent=1))
    print(json.dumps(summary["sequence"], indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {args.out}")
