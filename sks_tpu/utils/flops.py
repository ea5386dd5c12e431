"""FLOP accounting registry.

The reference carries per-stage FLOP counts as inline comments on nearly every
line (``ACA_SKS.cpp:27-98``) and headline counts in the README; here they are
data, checked against XLA's own cost analysis (tests/test_utils.py) and
usable for roofline estimates in the bench layer.
"""

from __future__ import annotations

__all__ = ["FLOPS", "bytes_per_hypothesis", "roofline_hps"]

#: Per-solve FLOP counts.  'solve' = up-to-scale; 'normalized' adds the 12-flop
#: H[8] normalization.  Sources: README.md:48-59, module docstrings.
FLOPS = {
    "aca": {"solve": 85, "normalized": 97, "divisions": 0},
    "sks": {"solve": 157, "normalized": 169, "divisions": 5},
    "aca_rect": {"solve": 47, "normalized": 59, "divisions": 0},
    "aca_square": {"solve": 44, "normalized": 56, "divisions": 0},
    "aca_qr": {"solve": 29, "normalized": 41, "divisions": 0},
    "rho_ge": {"solve": 221, "normalized": 221, "divisions": 10},
    "gpt_lu": {"solve": 1950, "normalized": 1950, "divisions": 8},
    # N-point solvers, counts at N=4 (reference formulas: DLT >=214N+26379,
    # HO >=118N+1354).
    "ndlt": {"solve": 27235, "normalized": 27247, "divisions": 12},
    "ho": {"solve": 1826, "normalized": 1838, "divisions": 12},
}


def bytes_per_hypothesis(dtype_bytes: int = 4, write_h: bool = True) -> int:
    """HBM traffic per hypothesis for a batched solve: 16 in, 9 out floats."""
    return (16 + (9 if write_h else 0)) * dtype_bytes


def roofline_hps(hbm_gbps: float, dtype_bytes: int = 4,
                 write_h: bool = True) -> float:
    """Bandwidth-bound ceiling in homographies/s for a batched solve.

    The batched minimal solvers are bandwidth-bound on any accelerator
    (<= 169 flops vs 100 B of traffic), so the roofline is simply
    bandwidth / bytes-per-hypothesis.
    """
    return hbm_gbps * 1e9 / bytes_per_hypothesis(dtype_bytes, write_h)
