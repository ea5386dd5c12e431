"""Pose-graph optimization on SE(3) (batched, matrix-free Gauss-Newton).

The loop-closure / odometry-chain refinement layer (BASELINE.json; no
reference counterpart).  Fixed-shape: K nodes, E edges with relative-pose
measurements and weights.  Residual per edge:

    r_e = log( Z_e^{-1} . T_i^{-1} . T_j )          (6,)

Gauss-Newton normal equations are built matrix-free with jvp/vjp
(Hessian-vector products) and solved by conjugate gradient — the design that
shards over edges with a psum reduction on multi-chip meshes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import Array

from sks_tpu.geom.lie import mm_small, se3_exp, se3_log

__all__ = ["PoseGraph", "posegraph_residuals", "optimize_posegraph",
           "optimize_posegraph_dense"]


@jax.tree_util.register_pytree_node_class
@dataclass
class PoseGraph:
    """poses: (K, 4, 4); edges: (E, 2) int32 (i, j); meas: (E, 4, 4) Z_ij;
    weights: (E,) nonnegative (0 disables an edge — fixed-shape padding)."""

    poses: Array
    edges: Array
    meas: Array
    weights: Array

    def tree_flatten(self):
        return (self.poses, self.edges, self.meas, self.weights), None

    @classmethod
    def tree_unflatten(cls, aux, c):
        return cls(*c)


def _inv_se3(g: Array) -> Array:
    r = g[..., :3, :3]
    t = g[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", rt, t)
    top = jnp.concatenate([rt, ti[..., None]], axis=-1)
    bot = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], g.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bot], axis=-2)


def posegraph_residuals(graph: PoseGraph, dx: Array | None = None) -> Array:
    """Weighted edge residuals (E, 6); dx (K, 6) is the GN increment."""
    poses = graph.poses
    if dx is not None:
        poses = mm_small(poses, se3_exp(dx))
    ti = poses[graph.edges[:, 0]]
    tj = poses[graph.edges[:, 1]]
    err = mm_small(mm_small(_inv_se3(graph.meas), _inv_se3(ti)), tj)
    r = se3_log(err)
    return r * jnp.sqrt(jnp.maximum(graph.weights, 0.0))[..., None]


def _cg(matvec, b, iters: int, eps: float = 1e-12):
    """Plain conjugate gradient, fixed iterations (jit/shard-friendly)."""
    x = jnp.zeros_like(b)
    r = b
    p = r
    rs = jnp.sum(r * r)

    def body(_, carry):
        x, r, p, rs = carry
        ap = matvec(p)
        alpha = rs / jnp.maximum(jnp.sum(p * ap), eps)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.sum(r * r)
        beta = rs_new / jnp.maximum(rs, eps)
        p = r + beta * p
        return x, r, p, rs_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
    return x


@partial(jax.jit, static_argnames=("gn_iters", "cg_iters", "fix_first"))
def optimize_posegraph(
    graph: PoseGraph,
    gn_iters: int = 10,
    cg_iters: int = 50,
    damping: float = 1e-6,
    fix_first: bool = True,
) -> PoseGraph:
    """Matrix-free Gauss-Newton: J^T J dx = -J^T r via jvp/vjp + CG."""
    k = graph.poses.shape[0]

    def step(graph):
        zero = jnp.zeros((k, 6), graph.poses.dtype)

        def res(dx):
            r = posegraph_residuals(graph, dx)
            if fix_first:
                r = jnp.concatenate([r.reshape(-1), 1e3 * dx[0]])
            return r

        r0 = res(zero)
        _, vjp = jax.vjp(res, zero)
        g = vjp(r0)[0]  # J^T r

        def jtjv(v):
            _, jv = jax.jvp(res, (zero,), (v.reshape(k, 6),))
            return (vjp(jv)[0] + damping * v.reshape(k, 6)).reshape(-1)

        dx = _cg(jtjv, -g.reshape(-1), cg_iters).reshape(k, 6)
        return PoseGraph(
            poses=mm_small(graph.poses, se3_exp(dx)),
            edges=graph.edges,
            meas=graph.meas,
            weights=graph.weights,
        )

    for _ in range(gn_iters):
        graph = step(graph)
    return graph


@partial(jax.jit, static_argnames=("gn_iters", "fix_first"))
def optimize_posegraph_dense(
    graph: PoseGraph,
    gn_iters: int = 10,
    damping: float = 1e-6,
    fix_first: bool = True,
) -> PoseGraph:
    """Dense Gauss-Newton for SMALL graphs: one vectorized Jacobian + a
    direct 6K x 6K solve per iteration.

    The matrix-free CG design (:func:`optimize_posegraph`) is built to shard
    over edges on a mesh, but on ONE device its 6K-dim solve costs
    ``gn_iters x cg_iters`` *sequential* Hessian-vector products — 150 tiny
    dependent steps for the default (5, 30), which is dispatch-latency bound
    on real hardware (measured ~80 ms of the planar-SLAM capstone's
    per-invoke time at T = 16).  For K up to a few hundred nodes the dense
    path replaces that with ``jax.jacfwd`` (ALL tangents in one batched
    forward pass) and a Cholesky-sized direct solve — exact normal-equation
    steps, no sequential chain.  Same math at CG convergence — validated
    against the CG path in tests/test_slam.py.  NOT currently wired as a
    default: measured *slower* than CG on real TPU hardware at the capstone
    T (the jacfwd batch materializes the full dense Jacobian), so
    ``slam.odometry`` keeps CG unconditionally and this stays a debug/
    validation alternative (ADVICE r4).
    """
    k = graph.poses.shape[0]

    def step(graph):
        zero = jnp.zeros((k, 6), graph.poses.dtype)

        def res(dx):
            r = posegraph_residuals(graph, dx).reshape(-1)
            if fix_first:
                r = jnp.concatenate([r, 1e3 * dx[0]])
            return r

        r0 = res(zero)
        jm = jax.jacfwd(res)(zero).reshape(r0.shape[0], k * 6)
        a = jm.T @ jm + damping * jnp.eye(k * 6, dtype=jm.dtype)
        g = jm.T @ r0
        dx = jnp.linalg.solve(a, -g).reshape(k, 6)
        return PoseGraph(
            poses=mm_small(graph.poses, se3_exp(dx)),
            edges=graph.edges,
            meas=graph.meas,
            weights=graph.weights,
        )

    for _ in range(gn_iters):
        graph = step(graph)
    return graph


def ate_rmse(poses_est: Array, poses_gt: Array) -> Array:
    """Absolute trajectory error (translation RMSE) after SE(3) alignment of
    the first pose (odometry convention)."""
    align = poses_gt[0] @ _inv_se3(poses_est[0])
    aligned = align @ poses_est
    d = aligned[:, :3, 3] - poses_gt[:, :3, 3]
    return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=-1)))
