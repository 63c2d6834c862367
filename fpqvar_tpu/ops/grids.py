"""Value grids for the custom low-bit floating-point formats.

The reference defines its FP formats *extensionally* as sorted value tables
(`models_fp_quant/quant_utils.py:232-234,539-581`).  We generate them from the
(exponent, mantissa) spec so arbitrary ExMy formats (including fp8 e4m3 for the
W8A8 config) fall out of one constructor, and keep the reference tables as
golden test vectors (tests/test_grids.py).

All grids are sorted ascending, symmetric unless noted, and normalized such
that quantization uses ``scale = absmax(x) / max(grid)``.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np


def fp_grid(exp_bits: int, man_bits: int, *, bias: int | None = None) -> np.ndarray:
    """Sorted value grid of a signed ExMy mini-float with no inf/nan codes.

    Matches the reference's conventions:

    - subnormals included (exponent field 0 → value = mantissa * 2^(1-bias)),
    - when ``exp_bits == 0`` the format is a pure fixed-point fraction
      (reference fp4 e0-style grids do not occur; e1m2's smallest step 0.25
      comes from bias=0 subnormals),
    - default bias chosen to reproduce the reference tables:
      e3m0 -> ±{0.25..16}, e2m1 -> ±{0.5..6}, e1m2 -> ±{0.25..1.75},
      e2m3 -> ±{0.125..7.5}, e3m2 -> ±{0.0625..28}.
    """
    if bias is None:
        # bias = 2^(e-1)-1 reproduces every reference table for e >= 2;
        # the e1 formats (e1m2) use bias 1 so subnormals cover {0.25..0.75}
        # and normals {1.0..1.75}.
        bias = (2 ** (exp_bits - 1) - 1) if exp_bits >= 2 else 1
    vals = set()
    n_man = 2 ** man_bits
    for e_field in range(2 ** exp_bits):
        for m_field in range(n_man):
            if e_field == 0:  # subnormal
                v = (m_field / n_man) * 2.0 ** (1 - bias)
            else:
                v = (1.0 + m_field / n_man) * 2.0 ** (e_field - bias)
            vals.add(v)
            vals.add(-v)
    vals.add(0.0)
    return np.array(sorted(vals), dtype=np.float32)


# --- fp4 (15 distinct values; the reference tables at quant_utils.py:232-234)
FP4_E3M0 = fp_grid(3, 0)                     # ±{0.25,0.5,1,2,4,8,16}, 0
FP4_E2M1 = fp_grid(2, 1)                     # ±{0.5,1,1.5,2,3,4,6}, 0
FP4_E1M2 = fp_grid(1, 2)                     # ±{0.25..1.75 step .25}, 0

# --- fp6 (63 distinct values; quant_utils.py:539-567)
FP6_E2M3 = fp_grid(2, 3)                     # ±{0.125..7.5}
FP6_E3M2 = fp_grid(3, 2)                     # ±{0.0625..28}

# --- fp8 e4m3 (OCP-style, no inf, max 448) for the W8A8 extension config
FP8_E4M3 = fp_grid(4, 3, bias=7)

# --- half-grids for the asymmetric dual-grid fc2 formats
# fc2 fp4: e1m2 negatives + e2m1 positives (quant_utils.py:383-384)
E1M2_NEG = np.concatenate([FP4_E1M2[FP4_E1M2 < 0], [0.0]]).astype(np.float32)
E2M1_POS = np.concatenate([[0.0], FP4_E2M1[FP4_E2M1 > 0]]).astype(np.float32)
# AFPQ baseline: e2m1 magnitudes on both sides, separate scales
# (quant_utils.py:501-502)
E2M1_NEG = np.concatenate([FP4_E2M1[FP4_E2M1 < 0], [0.0]]).astype(np.float32)
# fc2 fp6: int6 negative half + e2m3 positive half (quant_utils.py:569-581)
INT_NEG = np.arange(-32.0, 1.0, dtype=np.float32)          # -32..0, 33 values
E2M3_POS = np.concatenate([[0.0], FP6_E2M3[FP6_E2M3 > 0]]).astype(np.float32)

#: name -> grid used by the single-grid quantizers
GRIDS = {
    "fp_e1": FP4_E1M2,
    "fp_e2": FP4_E2M1,
    "fp_e3": FP4_E3M0,
    "fp6_e2m3": FP6_E2M3,
    "fp6_e3m2": FP6_E3M2,
    "fp8_e4m3": FP8_E4M3,
}

#: name -> (neg_grid, pos_grid) used by the dual-grid quantizers
DUAL_GRIDS = {
    "fp_e1m2_neg_e2m1_pos": (E1M2_NEG, E2M1_POS),
    "fp4_afpq": (E2M1_NEG, E2M1_POS),
    "fp6_int_neg_e2m3_pos": (INT_NEG, E2M3_POS),
}


@lru_cache(maxsize=None)
def grid_midpoints(name: str) -> np.ndarray:
    g = GRIDS[name]
    return ((g[1:] + g[:-1]) / 2.0).astype(np.float32)


def int_grid(n_bits: int, symmetric: bool = True) -> np.ndarray:
    """Plain integer grid, for uniformity with the grid-snap machinery."""
    q_max = 2 ** (n_bits - 1) - 1
    q_min = -(2 ** (n_bits - 1))
    if symmetric:
        return np.arange(-q_max, q_max + 1, dtype=np.float32)
    return np.arange(q_min, q_max + 1, dtype=np.float32)
