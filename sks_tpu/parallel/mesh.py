"""Mesh construction helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(axis_sizes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a Mesh from named axis sizes (default: all devices on 'hyp').

    ``{'hyp': -1}``-style -1 entries absorb the remaining device count.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {"hyp": n}
    names = tuple(axis_sizes)
    sizes = list(axis_sizes.values())
    unknown = [i for i, s in enumerate(sizes) if s == -1]
    known = int(np.prod([s for s in sizes if s != -1]))
    if unknown:
        assert len(unknown) == 1 and n % known == 0
        sizes[unknown[0]] = n // known
    assert int(np.prod(sizes)) == n, (sizes, n)
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, names)
