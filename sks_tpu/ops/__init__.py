"""Batched homography solver ops: one canonical formulation per algorithm.

Every solver maps ``(..., 4, 2) x (..., 4, 2) -> (..., 3, 3)`` (NDLT/HO accept
``N >= 4`` points), broadcasts over leading batch dims, and preserves dtype
(bf16 / f32 / f64) — replacing the reference's four hand-duplicated stacks
with one dtype-polymorphic source (see SURVEY.md §1).
"""

from sks_tpu.ops.aca import aca, aca_h, aca_valid_mask  # noqa: F401
from sks_tpu.ops.sks import sks, sks_h, sks_valid_mask  # noqa: F401
from sks_tpu.ops.aca_rect import (  # noqa: F401
    aca_qr,
    aca_qr_h,
    aca_rect,
    aca_rect_h,
    aca_square,
    aca_square_h,
    rect_corners,
)
from sks_tpu.ops.affine import (  # noqa: F401
    affine_3pt,
    affine_3pt_h,
    affine_valid_mask,
)
from sks_tpu.ops.ndlt import ndlt, ndlt_h  # noqa: F401
from sks_tpu.ops.ho import ho, ho_h  # noqa: F401
from sks_tpu.ops.gpt import gpt_lu  # noqa: F401
from sks_tpu.ops.ge import rho_ge  # noqa: F401
from sks_tpu.ops.factors import (  # noqa: F401
    ACAFactors,
    SKSFactors,
    aca_factors,
    sks_factors,
    sks_kernel_chain,
)
from sks_tpu.ops.df64 import (  # noqa: F401
    DF,
    aca_df64,
    aca_df64_h,
    df_from_f64,
    df_lift,
    df_to_f64,
)
from sks_tpu.ops import linalg  # noqa: F401

#: 4-point solvers, name -> callable(src, tar) -> normalized H.
#: Mirrors the reference benchmark matrix (CPU harness `main.cpp:61-114`,
#: GPU drivers `.cu:1457-1490`).
SOLVERS = {
    "aca": aca,
    "sks": sks,
    "ndlt": ndlt,
    "ho": ho,
    "gpt_lu": gpt_lu,
    "rho_ge": rho_ge,
}

#: Up-to-scale variants where the algorithm has a cheaper unnormalized form.
SOLVERS_H = {
    "aca": aca_h,
    "sks": sks_h,
    "ndlt": ndlt_h,
    "ho": ho_h,
    "gpt_lu": gpt_lu,
    "rho_ge": rho_ge,
}


def solve_h(name: str, src, tar):
    """Dispatch to an up-to-scale solver by name."""
    return SOLVERS_H[name](src, tar)
