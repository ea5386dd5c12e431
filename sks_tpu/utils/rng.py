"""Shared RNG-stream derivation.

One place for the per-index key-derivation idiom so the disjointness
contract between streams lives in one file: all batched fits derive their
per-item keys as ``fold_in(key, offset + i)``, and callers that need a
second stream from the same base key (e.g. loop-closure fits next to
consecutive-pair fits) pick non-overlapping offset ranges —
``CLOSURE_STREAM_OFFSET`` marks the reserved block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

__all__ = ["fold_in_stream", "CLOSURE_STREAM_OFFSET"]

#: Offset of the loop-closure key stream in ``slam.odometry.vo_trajectory``;
#: consecutive-pair streams use [0, T-1), so T-1 must stay below this.
CLOSURE_STREAM_OFFSET = 10_000


def fold_in_stream(key: Array, n: int, offset: int = 0) -> Array:
    """(n,) keys: ``fold_in(key, offset + i)`` for i in range(n)."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i + offset))(
        jnp.arange(n)
    )
