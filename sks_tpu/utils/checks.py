"""Numeric-health checking for solver pipelines.

The XLA functional model has no data races to detect (SURVEY.md §5); the
failure mode that matters is silent NaN/Inf propagation from degenerate
minimal sets.  Production paths mask degeneracies (RANSAC scores them -1);
these helpers are the *debug* layer: checkify-wrapped solvers that report the
first non-finite product, and a summary counter for batches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from sks_tpu.ops import SOLVERS_H

__all__ = ["checked_solver", "nonfinite_fraction", "assert_finite"]


def checked_solver(name: str):
    """A checkify-wrapped solver: ``err, h = fn(src, tar)``.

    ``err.throw()`` raises with a message if any output is non-finite.
    """
    solver = SOLVERS_H[name]

    def fn(src, tar):
        h = solver(src, tar)
        checkify.check(
            jnp.all(jnp.isfinite(h)), "non-finite homography in batch"
        )
        # Division-free solvers signal degeneracy with an (all-zero) rank-drop
        # instead of inf/nan — catch that too.
        scale = jnp.max(jnp.abs(h), axis=(-2, -1))
        checkify.check(
            jnp.all(scale > 0), "zero (degenerate) homography in batch"
        )
        return h

    return checkify.checkify(fn)


@jax.jit
def nonfinite_fraction(h) -> jax.Array:
    """Fraction of batch entries with any non-finite element."""
    bad = ~jnp.all(jnp.isfinite(h), axis=(-2, -1))
    return jnp.mean(bad.astype(jnp.float32))


@partial(jax.jit, static_argnames=("msg",))
def assert_finite(x, msg: str = "non-finite"):
    """Debug-callback assertion usable inside jit (no-op when all finite)."""
    ok = jnp.all(jnp.isfinite(x))

    def cb(ok_val):
        if not bool(ok_val):
            raise FloatingPointError(msg)

    jax.debug.callback(cb, ok)
    return x
