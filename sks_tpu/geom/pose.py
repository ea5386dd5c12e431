"""Homography -> relative pose recovery (batched Faugeras-Lustman decomposition).

New capability beyond the reference (BASELINE.json north star: planar
SLAM/VO): decompose a calibrated homography into the physical
``(R, t/d, n)`` candidates and select the true one by cheirality.

Method: with ``Hn = K2^{-1} H K1`` and SVD ``Hn = U diag(d1,d2,d3) V^T``
(``d1 >= d2 >= d3``, scale fixed by ``d2 = 1``), the Faugeras-Lustman closed
form yields four candidate ``(R', t', n')`` in the SVD frame (sign choices
``e1, e3 = +-1``):

    aux1 = sqrt((d1^2-d2^2)/(d1^2-d3^2)),  aux3 = sqrt((d2^2-d3^2)/(d1^2-d3^2))
    n' = (e1 aux1, 0, e3 aux3)
    sin t = e1 e3 sqrt((d1^2-d2^2)(d2^2-d3^2)) / ((d1+d3) d2)
    cos t = (d2^2 + d1 d3) / ((d1+d3) d2)
    R' = R_y(t),  t' = (d1-d3) (e1 aux1, 0, -e3 aux3)

mapped back by ``R = s U R' V^T``, ``t = U t'``, ``n = V n'``
(``s = det U det V``).  The SVD comes from a batched symmetric
eigendecomposition of ``Hn^T Hn`` with ``U = Hn V diag(1/d)``.

The reference has no pose layer at all; parity target for selection behavior
is the classical cheirality test (all reconstructed points in front of both
cameras).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from sks_tpu.ops.linalg import mm_highest as _mm

__all__ = ["decompose_homography", "select_pose", "recover_pose"]


def _sym_eig_desc(a: Array):
    """Batched symmetric eig, eigenvalues descending."""
    w, v = jnp.linalg.eigh(a)  # ascending
    return w[..., ::-1], v[..., ::-1]


def decompose_homography(hn: Array):
    """All four Faugeras candidates of a *calibrated* homography.

    Args:
      hn: (..., 3, 3) calibrated homography (``K2^{-1} H K1``), any scale.

    Returns:
      dict with 'r' (..., 4, 3, 3), 't' (..., 4, 3) (scale = translation/d),
      'n' (..., 4, 3) plane normals in camera-1 frame, and 'degenerate'
      (...,) bool — True where H is (near) a pure rotation (d1 ~ d2 ~ d3), in
      which case t ~ 0 and n is meaningless.
    """
    w, v = _sym_eig_desc(_mm(jnp.swapaxes(hn, -1, -2), hn))
    w = jnp.maximum(w, 0.0)
    d = jnp.sqrt(w)
    d1, d2, d3 = d[..., 0], d[..., 1], d[..., 2]
    # Scale to d2 = 1.
    inv_d2 = 1.0 / d2
    hs = hn * inv_d2[..., None, None]
    d1n = d1 * inv_d2
    d3n = d3 * inv_d2

    u = _mm(hs, v) * jnp.where(d > 0, d2[..., None] / d, 0.0)[..., None, :]
    s = jnp.linalg.det(u) * jnp.linalg.det(v)

    denom = jnp.maximum(d1n * d1n - d3n * d3n, 1e-12)
    aux1 = jnp.sqrt(jnp.maximum(d1n * d1n - 1.0, 0.0) / denom)
    aux3 = jnp.sqrt(jnp.maximum(1.0 - d3n * d3n, 0.0) / denom)
    dsum = jnp.maximum(d1n + d3n, 1e-12)
    sin_t = jnp.sqrt(
        jnp.maximum(d1n * d1n - 1.0, 0.0) * jnp.maximum(1.0 - d3n * d3n, 0.0)
    ) / dsum
    cos_t = (1.0 + d1n * d3n) / dsum

    signs = jnp.asarray(
        [[1.0, 1.0], [1.0, -1.0], [-1.0, 1.0], [-1.0, -1.0]], hn.dtype
    )  # (4, 2) = (e1, e3)
    e1 = signs[:, 0]
    e3 = signs[:, 1]

    def bc(x):  # (...,) -> (..., 4)
        return x[..., None]

    st = bc(sin_t) * e1 * e3
    ct = jnp.broadcast_to(bc(cos_t), st.shape)
    zero = jnp.zeros_like(st)
    one = jnp.ones_like(st)
    # R'(theta) about y: rows.
    rp = jnp.stack(
        [
            jnp.stack([ct, zero, -st], axis=-1),
            jnp.stack([zero, one, zero], axis=-1),
            jnp.stack([st, zero, ct], axis=-1),
        ],
        axis=-2,
    )  # (..., 4, 3, 3)
    np_ = jnp.stack([bc(aux1) * e1, zero, bc(aux3) * e3], axis=-1)  # (...,4,3)
    tp = (bc(d1n) - bc(d3n))[..., None] * jnp.stack(
        [bc(aux1) * e1, zero, -bc(aux3) * e3], axis=-1
    )

    uu = u[..., None, :, :]
    vv = v[..., None, :, :]
    r = s[..., None, None, None] * _mm(_mm(uu, rp), jnp.swapaxes(vv, -1, -2))
    t = jnp.einsum("...ij,...kj->...ki", u, tp, precision="highest")
    n = jnp.einsum("...ij,...kj->...ki", v, np_, precision="highest")
    # Canonicalize: plane normal towards camera 1 (n_z > 0 convention).
    flip = jnp.where(n[..., 2:3] < 0, -1.0, 1.0)
    n = n * flip
    t = t * flip

    degenerate = (d1n - d3n) < 1e-6
    return {"r": r, "t": t, "n": n, "degenerate": degenerate}


def select_pose(cands: dict, pts1n: Array, pts2n: Array,
                normal_prior: Array | None = None):
    """Pick the physical candidate by cheirality (positive depths).

    A single homography generically admits *two* cheirality-consistent
    interpretations (the classic twofold ambiguity); ``normal_prior`` — an
    approximate plane normal in the camera-1 frame, e.g. the tracked normal in
    VO — adds a tie-breaking bonus of ``0.1 * (n . prior)`` to each candidate.

    Args:
      cands: output of :func:`decompose_homography`.
      pts1n, pts2n: (..., N, 2) correspondences in *normalized camera*
        coordinates (K^{-1} applied).
      normal_prior: optional (..., 3) unit vector.

    Returns:
      (r (...,3,3), t (...,3), n (...,3), score (...,)) — score is the
      fraction of points passing cheirality for the winner (prior bonus
      excluded).
    """
    r, t, n = cands["r"], cands["t"], cands["n"]
    m1 = jnp.concatenate([pts1n, jnp.ones_like(pts1n[..., :1])], axis=-1)

    # Cheirality. With the n_z>0 canonicalization and plane depth d=1, the
    # camera-1 point on the plane along ray m1 is X1 = m1 / (n . m1):
    #   depth-1 positivity:  n . m1 > 0
    #   depth-2 positivity:  z2 = [R X1 + t]_z > 0
    ndotm = jnp.einsum("...kj,...nj->...kn", n, m1)  # (..., 4, N)
    vis1 = ndotm > 0
    rx = jnp.einsum("...kij,...nj->...kni", r, m1)  # (..., 4, N, 3)
    z2 = rx[..., 2] / jnp.where(ndotm == 0, 1e-12, ndotm) + t[..., None, 2]
    vis2 = z2 > 0
    good = (vis1 & vis2).mean(axis=-1)  # (..., 4)
    ranking = good
    if normal_prior is not None:
        bonus = jnp.einsum("...kj,...j->...k", n, normal_prior, precision="highest")
        ranking = ranking + 0.1 * bonus
    best = jnp.argmax(ranking, axis=-1)

    r_b = jnp.take_along_axis(
        r, best[..., None, None, None].astype(jnp.int32), axis=-3
    ).squeeze(-3)
    t_b = jnp.take_along_axis(
        t, best[..., None, None].astype(jnp.int32), axis=-2
    ).squeeze(-2)
    n_b = jnp.take_along_axis(
        n, best[..., None, None].astype(jnp.int32), axis=-2
    ).squeeze(-2)
    score = jnp.take_along_axis(good, best[..., None], axis=-1).squeeze(-1)
    return r_b, t_b, n_b, score


def recover_pose(h: Array, k1: Array, k2: Array, pts1: Array, pts2: Array,
                 normal_prior: Array | None = None):
    """End-to-end: pixel homography + intrinsics -> (R, t/d, n, score)."""
    k1i = jnp.linalg.inv(k1)
    k2i = jnp.linalg.inv(k2)
    hn = _mm(_mm(k2i, h), k1)
    cands = decompose_homography(hn)

    def norm_pts(pts, ki):
        m = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
        mn = jnp.einsum("...ij,...nj->...ni", ki, m, precision="highest")
        return mn[..., :2] / mn[..., 2:3]

    return select_pose(
        cands, norm_pts(pts1, k1i), norm_pts(pts2, k2i), normal_prior
    )
