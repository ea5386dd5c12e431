"""Pallas ACA kernels: batched solve, and solve fused with RANSAC scoring.

Layout: the TPU analogue of the reference's SoA design (element k of
hypothesis ``id`` at ``ptr[id + k*offset]``, ``GPU_Runtime Test.cu:87-95``).
Here SoA means *component-major*: a batch of B hypotheses is ``(8, M, 128)``
with ``M = B/128`` — component index major, then sublane x lane tiles of
hypotheses.  Every elementwise op then runs on full ``(TS, 128)`` VPU tiles.

Two kernels:

* :func:`aca_solve_soa` — 16 floats in, 9 out per hypothesis; bandwidth-bound
  (~100 B/hyp), the Table-8-comparable configuration.
* :func:`aca_solve_score_soa` — solve + symmetric-transfer scoring against N
  replicated points, emitting only the per-hypothesis score (4 B/hyp out);
  the RANSAC production configuration (hypotheses never hit HBM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sks_tpu.ops.aca import aca_core

__all__ = [
    "aca_solve_soa",
    "aca_solve_score_soa",
    "aca_h_pallas",
    "to_soa",
    "from_soa_h",
]

LANES = 128


def to_soa(pts: Array) -> Array:
    """(B, 4, 2) -> (8, B/128, 128) component-major SoA.  B % 128 == 0."""
    b = pts.shape[0]
    assert b % LANES == 0, b
    return pts.reshape(b, 8).T.reshape(8, b // LANES, LANES)


def from_soa_h(h: Array) -> Array:
    """(9, M, 128) -> (B, 3, 3)."""
    m = h.shape[1]
    return h.reshape(9, m * LANES).T.reshape(m * LANES, 3, 3)


def _solve_kernel(chain_ref, src_ref, tar_ref, out_ref):
    # Compute in f32 regardless of the storage dtype: for bf16 I/O this halves
    # HBM traffic (the bound) while keeping full VPU precision — the storage
    # roundoff dominates the result error, not the arithmetic.
    s = [src_ref[i].astype(jnp.float32) for i in range(8)]
    t = [tar_ref[i].astype(jnp.float32) for i in range(8)]
    # chain: a scalar data dependency used by the benchmark harness to
    # serialize back-to-back kernel invocations without extra HBM traffic.
    # 1e-38 * anything is below pixel-coordinate roundoff; not foldable.
    s[0] = s[0] + chain_ref[0] * 1e-38
    h = aca_core(*s, *t)
    for i in range(9):
        out_ref[i] = h[i].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile",))
def aca_solve_soa(src: Array, tar: Array, chain: Array | None = None,
                  tile: int = 128) -> Array:
    """Batched division-free ACA on SoA inputs.

    Args:
      src, tar: (8, M, 128) component-major hypotheses (see :func:`to_soa`).
      chain: optional f32 scalar forced into the compute (serialization hook
        for honest steady-state timing; None -> 0).
      tile: sublane tile (hypotheses per grid step = tile * 128).

    Returns:
      (9, M, 128) up-to-scale homographies, component-major.
    """
    _, m, _ = src.shape
    tile = min(tile, m)
    assert m % tile == 0, (m, tile)
    grid = (m // tile,)
    if chain is None:
        chain = jnp.zeros((), jnp.float32)
    spec_in = pl.BlockSpec((8, tile, LANES), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((9, tile, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _solve_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec_in,
            spec_in,
        ],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((9, m, LANES), src.dtype),
        cost_estimate=pl.CostEstimate(
            flops=97 * m * LANES,
            bytes_accessed=(16 + 9) * m * LANES * src.dtype.itemsize,
            transcendentals=0,
        ),
    )(chain.astype(jnp.float32).reshape(1), src, tar)


def aca_h_pallas(src: Array, tar: Array) -> Array:
    """(B, 4, 2) convenience wrapper: AoS -> SoA -> solve -> AoS.

    The layout shuffle costs one extra HBM round trip; production pipelines
    should keep hypotheses in SoA end-to-end (sample directly into SoA).
    """
    h = aca_solve_soa(to_soa(src), to_soa(tar))
    return from_soa_h(h)


def _solve_score_kernel(thr_ref, pts_ref, w_ref, src_ref, tar_ref, score_ref,
                        *, point_block, scoring):
    # Grid is (hypothesis tiles, point blocks) with the point axis minor: the
    # score block stays VMEM-resident while point blocks stream through SMEM
    # (scalar memory — the only space Mosaic allows dynamically-indexed
    # per-point loads from), so N is unbounded.  src/tar block indices are
    # invariant along the point axis (no re-DMA); the 97-flop solve is
    # recomputed per point block, which is noise next to 36 flops x block.
    j_block = pl.program_id(1)

    @pl.when(j_block == 0)
    def _():
        score_ref[...] = jnp.zeros_like(score_ref)

    # Compute in f32 regardless of storage dtype (bf16 storage halves the
    # dominant hypothesis stream; arithmetic stays full VPU precision).
    s = [src_ref[i].astype(jnp.float32) for i in range(8)]
    t = [tar_ref[i].astype(jnp.float32) for i in range(8)]
    h00, h01, h02, h10, h11, h12, h20, h21, h22 = aca_core(*s, *t)
    t2 = thr_ref[0]

    # Adjugate for the reverse transfer (division-free up-to-scale inverse).
    i00 = h11 * h22 - h12 * h21
    i01 = h02 * h21 - h01 * h22
    i02 = h01 * h12 - h02 * h11
    i10 = h12 * h20 - h10 * h22
    i11 = h00 * h22 - h02 * h20
    i12 = h02 * h10 - h00 * h12
    i20 = h10 * h21 - h11 * h20
    i21 = h01 * h20 - h00 * h21
    i22 = h00 * h11 - h01 * h10

    shape = s[0].shape
    acc = jnp.zeros(shape, jnp.float32)

    def body(j, acc):
        x = pts_ref[0, j]
        y = pts_ref[1, j]
        xp = pts_ref[2, j]
        yp = pts_ref[3, j]
        pw = w_ref[0, j]
        # Forward transfer.
        w = h20 * x + h21 * y + h22
        inv_w = 1.0 / w
        dx = (h00 * x + h01 * y + h02) * inv_w - xp
        dy = (h10 * x + h11 * y + h12) * inv_w - yp
        r2 = dx * dx + dy * dy
        # Reverse transfer.
        wr = i20 * xp + i21 * yp + i22
        inv_wr = 1.0 / wr
        dxr = (i00 * xp + i01 * yp + i02) * inv_wr - x
        dyr = (i10 * xp + i11 * yp + i12) * inv_wr - y
        r2 = r2 + dxr * dxr + dyr * dyr
        finite = (w != 0.0) & (wr != 0.0)
        # All gains gate on r2 < t2 via where: NaN residuals (0 * inf in a
        # degenerate transfer) compare False and score 0, never propagate.
        inl = r2 < t2
        if scoring == "inliers":
            gain = inl.astype(jnp.float32)
        elif scoring == "msac":
            gain = jnp.where(inl, 1.0 - r2 / t2, 0.0)
        elif scoring == "magsac":
            # t2 carries (k * sigma_max)^2 here; the sigma-marginalized
            # weight is (1 - r / (k sigma_max))^2 clipped to [0, 1]
            # (robust.ransac.magsac_weights) — zero exactly when r2 >= t2.
            rr = jnp.sqrt(jnp.maximum(r2, 0.0) / t2)
            g = 1.0 - rr
            gain = jnp.where(inl, g * g, 0.0)
        else:
            raise ValueError(scoring)
        return acc + jnp.where(finite, gain, 0.0) * pw

    acc = jax.lax.fori_loop(0, point_block, body, acc)
    score_ref[...] += acc


@functools.partial(jax.jit,
                   static_argnames=("scoring", "tile", "point_block"))
def aca_solve_score_soa(
    src: Array, tar: Array, pts: Array, threshold: Array,
    point_weights: Array | None = None, scoring: str = "inliers",
    tile: int = 256, point_block: int = 2048,
) -> Array:
    """Fused ACA solve + symmetric-transfer RANSAC scoring.

    Every hypothesis is solved *and* scored against all N correspondences in
    one VMEM-resident kernel; only 4 B/hypothesis of score reaches HBM.
    Points stream through SMEM in blocks of ``point_block`` along a second
    grid axis, so N is unbounded; ``point_weights`` supports padded point
    sets (weight 0) and soft weighting.

    Args:
      src, tar: (8, M, 128) SoA minimal sets.
      pts: (4, N) correspondence set rows [x, y, x', y'].
      threshold: scalar squared threshold.  'inliers' counts
        ``r2_fwd + r2_bwd < threshold``; 'msac' sums truncated-quadratic
        gains ``max(0, 1 - r2/threshold)``; 'magsac' sums the
        sigma-marginalized weights with ``threshold = (k * sigma_max)^2``
        (matching :func:`sks_tpu.robust.ransac.magsac_weights`).
      point_weights: optional (N,) gains multiplier (0 drops a point).

    Returns:
      (1, M, 128) float32 scores (component-major like the inputs).
    """
    _, m, _ = src.shape
    tile = min(tile, m)
    assert m % tile == 0
    n = pts.shape[1]
    if point_weights is None:
        point_weights = jnp.ones((n,), jnp.float32)
    point_block = min(point_block, n)
    pad = (-n) % point_block
    if pad:
        pts = jnp.pad(pts, ((0, 0), (0, pad)))
        point_weights = jnp.pad(point_weights, (0, pad))
    n_pad = n + pad
    n_blocks = n_pad // point_block

    grid = (m // tile, n_blocks)
    spec_in = pl.BlockSpec((8, tile, LANES), lambda i, j: (0, i, 0),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(_solve_score_kernel, point_block=point_block,
                               scoring=scoring)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # threshold (1,)
            pl.BlockSpec((4, point_block), lambda i, j: (0, j),
                         memory_space=pltpu.SMEM),  # point block
            pl.BlockSpec((1, point_block), lambda i, j: (0, j),
                         memory_space=pltpu.SMEM),  # weight block
            spec_in,
            spec_in,
        ],
        out_specs=pl.BlockSpec((1, tile, LANES), lambda i, j: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m, LANES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=(97 + 38 * n_pad) * m * LANES,
            bytes_accessed=(16 + 1) * m * LANES * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(threshold, jnp.float32).reshape(1),
      pts.astype(jnp.float32),
      point_weights.astype(jnp.float32).reshape(1, n_pad),
      src, tar)
