"""Point-sharded N-point solvers: the sequence-parallel reduction pattern.

SURVEY.md §5 identifies the reference's two scaling axes: hypothesis count B
(sharded in ``sharded_ransac``) and point count N for the N>=4 least-squares
solvers (``DLT.cpp:50`` >=214N flops; ``HO.cpp:29`` >=118N).  This module
shards the *points* of one large refinement problem across the mesh — the
genuine "sequence-parallel-like" reduction: each device accumulates partial
normalization statistics and partial normal matrices over its point shard,
and three tiny ``psum`` rounds (O(1) floats each — stats, then the 9x9 / 3x3
normal blocks) produce the identical replicated solution on every device.

Math identical to :func:`sks_tpu.ops.ndlt.ndlt_h` / :func:`sks_tpu.ops.ho.ho_h`
(weighted; weight 0 pads ragged shards), asserted bit-tight in
``tests/test_parallel.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sks_tpu.ops.linalg import jacobi_eigh, mm_highest as _mm

__all__ = ["sharded_ndlt_h", "sharded_ho_h"]

_HP = dict(precision="highest")


def sharded_ndlt_h(
    mesh: Mesh,
    src: Array,
    tar: Array,
    weights: Array | None = None,
    axis: str = "pts",
) -> Array:
    """NDLT over (N, 2) correspondences sharded across ``mesh[axis]``.

    Returns the replicated (3, 3) up-to-scale homography (identical on every
    device, == the single-device :func:`sks_tpu.ops.ndlt.ndlt_h`).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)

    def shard_fn(src, tar, w):
        # Round 1: global Hartley stats (weighted mean, then mean |dev|).
        wsum = jax.lax.psum(jnp.sum(w), axis)
        c1 = jax.lax.psum(jnp.sum(src * w[:, None], 0), axis) / wsum
        c2 = jax.lax.psum(jnp.sum(tar * w[:, None], 0), axis) / wsum
        d1 = src - c1
        d2 = tar - c2
        dev1 = jax.lax.psum(jnp.sum(jnp.abs(d1) * w[:, None], 0), axis) / wsum
        dev2 = jax.lax.psum(jnp.sum(jnp.abs(d2) * w[:, None], 0), axis) / wsum
        s1 = 1.0 / jnp.maximum(dev1, jnp.finfo(src.dtype).tiny)
        s2 = 1.0 / jnp.maximum(dev2, jnp.finfo(src.dtype).tiny)
        sn = d1 * s1
        tn = d2 * s2

        # Round 2: the 9x9 normal matrix is a sum over points — psum of the
        # local partial (the only "sequence-parallel" collective that scales
        # with nothing: 81 floats).
        x, y = sn[:, 0], sn[:, 1]
        xp, yp = tn[:, 0], tn[:, 1]
        one = jnp.ones_like(x)
        zero = jnp.zeros_like(x)
        rows_x = jnp.stack(
            [x, y, one, zero, zero, zero, -xp * x, -xp * y, -xp], -1)
        rows_y = jnp.stack(
            [zero, zero, zero, x, y, one, -yp * x, -yp * y, -yp], -1)
        a = jnp.concatenate([rows_x, rows_y], 0)
        w2 = jnp.concatenate([w, w], 0)
        ltl = jax.lax.psum(
            jnp.einsum("np,n,nq->pq", a, w2, a, **_HP), axis)

        _, v = jacobi_eigh(ltl)
        hm = v[:, 0].reshape(3, 3)
        t1 = jnp.asarray(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], src.dtype)
        t1 = t1.at[0, 0].set(s1[0]).at[1, 1].set(s1[1])
        t1 = t1.at[0, 2].set(-s1[0] * c1[0]).at[1, 2].set(-s1[1] * c1[1])
        t2i = jnp.asarray(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], src.dtype)
        t2i = t2i.at[0, 0].set(1.0 / s2[0]).at[1, 1].set(1.0 / s2[1])
        t2i = t2i.at[0, 2].set(c2[0]).at[1, 2].set(c2[1])
        return _mm(_mm(t2i, hm), t1)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(src, tar, weights)


def sharded_ho_h(
    mesh: Mesh,
    src: Array,
    tar: Array,
    weights: Array | None = None,
    axis: str = "pts",
) -> Array:
    """Harker-O'Leary over point-sharded (N, 2) correspondences.

    Three psum rounds: isotropic stats; the 3x3 blocks G = C^T W C and
    M = C^T W diag(vals) C; then the reduced 3x3 D^T D (whose rows need the
    *global* G^{-1} M).  Replicated (3, 3), == single-device ``ho_h``.
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)

    def shard_fn(src, tar, w):
        tiny = jnp.finfo(src.dtype).tiny
        wsum = jax.lax.psum(jnp.sum(w), axis)
        c1 = jax.lax.psum(jnp.sum(src * w[:, None], 0), axis) / wsum
        c2 = jax.lax.psum(jnp.sum(tar * w[:, None], 0), axis) / wsum
        d1 = src - c1
        d2 = tar - c2
        m1 = jax.lax.psum(
            jnp.sum(jnp.sqrt(jnp.sum(d1 * d1, -1)) * w), axis) / wsum
        m2 = jax.lax.psum(
            jnp.sum(jnp.sqrt(jnp.sum(d2 * d2, -1)) * w), axis) / wsum
        sq2 = jnp.sqrt(jnp.asarray(2.0, src.dtype))
        s1 = sq2 / jnp.maximum(m1, tiny)
        s2 = sq2 / jnp.maximum(m2, tiny)
        sn = d1 * s1
        tn = d2 * s2

        x, y = sn[:, 0], sn[:, 1]
        xp, yp = tn[:, 0], tn[:, 1]
        one = jnp.ones_like(x)
        cw = jnp.stack([x, y, one], -1)          # C rows
        c = cw * w[:, None]                      # weighted C

        g3 = jax.lax.psum(jnp.einsum("ni,nj->ij", c, cw, **_HP), axis)
        mx = jax.lax.psum(
            jnp.einsum("ni,nj->ij", c, xp[:, None] * cw, **_HP), axis)
        my = jax.lax.psum(
            jnp.einsum("ni,nj->ij", c, yp[:, None] * cw, **_HP), axis)
        ginv = jnp.linalg.inv(g3)

        def partial_dtd(vals, m):
            k = _mm(ginv, m)
            r = jnp.einsum("ni,ik->nk", cw, k, **_HP) - vals[:, None] * cw
            return jnp.einsum("ni,n,nj->ij", r, w, r, **_HP)

        dtd = jax.lax.psum(
            partial_dtd(xp, mx) + partial_dtd(yp, my), axis)
        _, v = jacobi_eigh(dtd)
        g = v[:, 0]
        u = _mm(ginv, _mm(mx, g[:, None]))[:, 0]
        vv = _mm(ginv, _mm(my, g[:, None]))[:, 0]
        hm = jnp.stack([u, vv, g], 0)

        z = jnp.zeros((), src.dtype)
        o = jnp.ones((), src.dtype)
        t1 = jnp.stack([
            jnp.stack([s1, z, -s1 * c1[0]]),
            jnp.stack([z, s1, -s1 * c1[1]]),
            jnp.stack([z, z, o]),
        ])
        t2i = jnp.stack([
            jnp.stack([1.0 / s2, z, c2[0]]),
            jnp.stack([z, 1.0 / s2, c2[1]]),
            jnp.stack([z, z, o]),
        ])
        return _mm(_mm(t2i, hm), t1)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(src, tar, weights)
