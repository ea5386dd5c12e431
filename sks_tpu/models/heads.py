"""Differentiable solver heads: 4-corner offsets -> homography.

The reference's PyTorch stack exists to compare solver *heads* for deep
homography networks (``PyTorch Codes/Modules_Runtime_Test.py``): TensorDLT_1
(Nguyen et al., 8x8 ``torch.inverse``), TensorDLT_2 (torchgeometry's
``get_perspective_transform``, as used by IHN), TensorGE (batched RHO
Gaussian elimination), and TensorACA_rect (the paper's contribution).  All
consume the "4-point parameterization": an axis-aligned source rectangle plus
per-corner offsets.

Here every head is one function over the same batched ops, selected by name —
each fully differentiable (closed-form ACA-rect; unrolled LU for the DLT-style
heads; masked elimination for GE) and jit/vmap/shard-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from sks_tpu.ops.aca_rect import aca_rect, aca_rect_h, rect_corners
from sks_tpu.ops.ge import rho_ge
from sks_tpu.ops.gpt import gpt_lu
from sks_tpu.ops.ndlt import ndlt

__all__ = ["offsets_to_h", "HEAD_METHODS"]

#: head name -> reference counterpart (Modules_Runtime_Test.py function).
HEAD_METHODS = {
    "aca_rect": "TensorACA_rect (:286-309)",
    "dlt": "TensorDLT_1 / TensorDLT_2 (:43-101; same 8x8 system, LU here)",
    "ge": "TensorGE (:107-283)",
    "ndlt": "(no reference twin; normalized least-squares head)",
}


def offsets_to_h(
    offsets: Array,
    origin: Array,
    size: Array,
    method: str = "aca_rect",
    normalize: bool = True,
) -> Array:
    """Homography from the 4-point offset parameterization.

    Args:
      offsets: (..., 4, 2) predicted corner displacements, in
        :func:`rect_corners` order [M, N, P, Q].
      origin: (..., 2) source rect top-left (x0, y0).
      size: (..., 2) source rect (width, height).
      method: one of :data:`HEAD_METHODS`.
      normalize: divide by H[2,2] (deep pipelines may skip it — the
        reference notes the warp is scale-invariant, ``ACA_rect.m:33-36``;
        only supported for ``aca_rect``, other heads already normalize).

    Returns:
      (..., 3, 3) homography mapping rect corners onto corners + offsets.
    """
    corners = rect_corners(origin, size)
    tar = corners + offsets
    if method == "aca_rect":
        return (
            aca_rect(tar, origin, size)
            if normalize
            else aca_rect_h(tar, origin, size)
        )
    if method == "dlt":
        return gpt_lu(corners, tar)
    if method == "ge":
        return rho_ge(corners, tar)
    if method == "ndlt":
        return ndlt(corners, tar)
    raise ValueError(f"unknown head {method!r}; options: {sorted(HEAD_METHODS)}")
