"""Golden-value tests: generated grids must equal the reference's hard-coded
tables (`models_fp_quant/quant_utils.py:232-234,539-581`)."""
import pytest
import numpy as np

from fpqvar_tpu.ops import grids as G

pytestmark = pytest.mark.quick

# Reference value tables (transcribed as *test vectors*, ascending order).
REF_FP4_E3M0 = [-16.0, -8.0, -4.0, -2.0, -1.0, -0.5, -0.25, 0.0,
                0.25, 0.5, 1.0, 2.0, 4.0, 8.0, 16.0]
REF_FP4_E2M1 = [-6.0, -4.0, -3.0, -2.0, -1.5, -1.0, -0.5, 0.0,
                0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0]
REF_FP4_E1M2 = [-1.75, -1.5, -1.25, -1.0, -0.75, -0.5, -0.25, 0.0,
                0.25, 0.5, 0.75, 1.0, 1.25, 1.5, 1.75]


def _pos_half(step_ranges):
    out = []
    for start, stop, step in step_ranges:
        out.extend(np.arange(start, stop + step / 2, step).tolist())
    return out


# fp6 e2m3: subnormal/first octave step .125 to 1.875, then .25 to 3.75,
# then .5 to 7.5  (quant_utils.py:539-548, 64 entries incl. duplicate 0)
REF_FP6_E2M3_POS = _pos_half([(0.125, 1.875, 0.125), (2.0, 3.75, 0.25),
                              (4.0, 7.5, 0.5)])
# fp6 e3m2 (quant_utils.py:550-567)
REF_FP6_E3M2_POS = _pos_half([
    (0.0625, 0.1875, 0.0625), (0.25, 0.4375, 0.0625), (0.5, 0.875, 0.125),
    (1.0, 1.75, 0.25), (2.0, 3.5, 0.5), (4.0, 7.0, 1.0), (8.0, 14.0, 2.0),
    (16.0, 28.0, 4.0),
])


def test_fp4_tables():
    np.testing.assert_array_equal(G.FP4_E3M0, np.float32(REF_FP4_E3M0))
    np.testing.assert_array_equal(G.FP4_E2M1, np.float32(REF_FP4_E2M1))
    np.testing.assert_array_equal(G.FP4_E1M2, np.float32(REF_FP4_E1M2))


def test_fp6_tables():
    pos = np.array(sorted(REF_FP6_E2M3_POS), dtype=np.float32)
    full = np.concatenate([-pos[::-1], [0.0], pos])
    np.testing.assert_array_equal(G.FP6_E2M3, full)

    pos = np.array(sorted(REF_FP6_E3M2_POS), dtype=np.float32)
    full = np.concatenate([-pos[::-1], [0.0], pos])
    np.testing.assert_array_equal(G.FP6_E3M2, full)


def test_dual_grids():
    # fc2 fp4: e1m2 negative half + e2m1 positive half (quant_utils.py:383-384)
    neg, pos = G.DUAL_GRIDS["fp_e1m2_neg_e2m1_pos"]
    np.testing.assert_array_equal(
        neg, np.float32([-1.75, -1.5, -1.25, -1.0, -0.75, -0.5, -0.25, 0.0]))
    np.testing.assert_array_equal(
        pos, np.float32([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0]))
    # AFPQ (quant_utils.py:501-502)
    neg, pos = G.DUAL_GRIDS["fp4_afpq"]
    np.testing.assert_array_equal(
        neg, np.float32([-6.0, -4.0, -3.0, -2.0, -1.5, -1.0, -0.5, 0.0]))
    # fc2 fp6 (quant_utils.py:569-581)
    neg, pos = G.DUAL_GRIDS["fp6_int_neg_e2m3_pos"]
    assert neg[0] == -32.0 and neg[-1] == 0.0 and len(neg) == 33
    assert pos[0] == 0.0 and pos[-1] == 7.5 and len(pos) == 32


def test_grids_sorted_and_symmetric():
    for name, g in G.GRIDS.items():
        assert np.all(np.diff(g) > 0), name
        np.testing.assert_allclose(g, -g[::-1], err_msg=name)
