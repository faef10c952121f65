"""Bit-exactness tests for the fixed-point requantize core.

Validates tachikoma_tpu/ops/fixed_point.py against the documented semantics of
the reference's `QMultiplyShift` (`src/target/intrin_rule.cc:166`) and
`FixedPointMultiplyToNearest` (`src/relay/qnn/utils.cc:59`) by independent
arbitrary-precision (python int) evaluation, including midpoint rounding.
"""

import math

import numpy as np
import pytest

from tachikoma_tpu.ops.fixed_point import (
    TONEAREST,
    UPWARD,
    fixed_point_multiplier_shift,
    q_multiply_shift_np,
    q_multiply_shift_per_axis_np,
    requantize_np,
)


def _wrap64(v: int) -> int:
    v &= 0xFFFFFFFFFFFFFFFF
    return v - (1 << 64) if v >= (1 << 63) else v


def ref_qms(x: int, m: int, shift: int, rounding: str) -> int:
    """Arbitrary-precision reference of the q_multiply_shift semantics.

    Intermediate values wrap at int64 exactly as the C++ (and numpy/XLA)
    implementations do — the product can overflow for |multiplier| > 1 at
    extreme int32 inputs, and the wrap is part of the pinned semantics."""
    left = shift if shift > 0 else 0
    right = -shift if shift < 0 else 0
    v = _wrap64(int(x) << left)
    v = _wrap64(v * m)
    n = right + 31
    if rounding == UPWARD:
        v += 1 << (n - 1)
    else:
        v += (1 << (n - 1)) if v >= 0 else (1 << (n - 1)) - 1
    v >>= n  # python >> on negative ints is arithmetic (floor), same as C++ int64
    # wrap to int32
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def test_multiplier_shift_decomposition():
    for mult in [0.00012, 0.25, 0.5, 0.9999, 1.0, 1.5, 3.75, 127.0, 1e-8]:
        m, s = fixed_point_multiplier_shift(mult)
        assert 0 <= m <= np.iinfo(np.int32).max
        # reconstruction: m/2^31 * 2^s ~= mult to double precision
        rec = (m / (1 << 31)) * math.pow(2.0, s)
        assert rec == pytest.approx(mult, rel=1e-9)
    assert fixed_point_multiplier_shift(0.0) == (0, 0)


@pytest.mark.parametrize("rounding", [UPWARD, TONEAREST])
@pytest.mark.parametrize("mult", [0.0003, 0.021, 0.25, 0.4999, 0.75, 1.0 - 2**-31, 1.75, 2.5])
def test_qms_matches_arbitrary_precision(rounding, mult):
    m, s = fixed_point_multiplier_shift(mult)
    rng = np.random.default_rng(42)
    xs = np.concatenate(
        [
            rng.integers(-(2**31), 2**31 - 1, size=1000, dtype=np.int64),
            np.array([0, 1, -1, 2**31 - 1, -(2**31), 127, -128, 255, -256]),
        ]
    ).astype(np.int32)
    got = q_multiply_shift_np(xs, m, s, rounding)
    want = np.array([ref_qms(int(x), m, s, rounding) for x in xs], dtype=np.int32)
    np.testing.assert_array_equal(got, want)


def test_midpoint_rounding_differs():
    # x * 0.5 at odd x: product is exactly k + 0.5.
    m, s = fixed_point_multiplier_shift(0.5)
    xs = np.array([1, 3, -1, -3, 5, -5], dtype=np.int32)
    up = q_multiply_shift_np(xs, m, s, UPWARD)
    near = q_multiply_shift_np(xs, m, s, TONEAREST)
    # UPWARD: round toward +inf at midpoints -> -1*0.5 = -0.5 -> 0
    np.testing.assert_array_equal(up, [1, 2, 0, -1, 3, -2])
    # TONEAREST: round half away from zero -> -0.5 -> -1
    np.testing.assert_array_equal(near, [1, 2, -1, -2, 3, -3])


def test_per_axis_matches_scalar():
    rng = np.random.default_rng(7)
    x = rng.integers(-(2**20), 2**20, size=(2, 5, 4), dtype=np.int64).astype(np.int32)
    mults = [0.003, 0.77, 1.25, 0.5]
    ms, ss = zip(*(fixed_point_multiplier_shift(v) for v in mults))
    for rounding in (UPWARD, TONEAREST):
        got = q_multiply_shift_per_axis_np(x, np.array(ms), np.array(ss), 2, rounding)
        for c in range(4):
            want = q_multiply_shift_np(x[:, :, c], ms[c], ss[c], rounding)
            np.testing.assert_array_equal(got[:, :, c], want)


def test_requantize_identity_scale():
    x = np.arange(-128, 128, dtype=np.int32)
    out = requantize_np(x, 0.1, 0, 0.1, 0, out_dtype="int8")
    np.testing.assert_array_equal(out, np.clip(x, -128, 127).astype(np.int8))


def test_requantize_zero_points():
    x = np.array([-10, 0, 10, 100], dtype=np.int32)
    # scale halves, zp moves
    out = requantize_np(x, 0.2, 2, 0.4, -3, out_dtype="int8")
    # float reference: ((x - 2) * 0.2 / 0.4) + (-3), round-ties-up
    want = np.clip(np.floor((x - 2) * 0.5 + 0.5) - 3, -128, 127).astype(np.int8)
    np.testing.assert_array_equal(out, want)


def test_requantize_float_agreement():
    """Fixed-point result equals round(x * mult) except possibly at values
    ~1 ulp from a rounding boundary (the reference has the same property)."""
    rng = np.random.default_rng(3)
    for mult in [0.0017, 0.1, 0.33, 0.9]:
        x = rng.integers(-(2**20), 2**20, size=5000).astype(np.int32)
        got = requantize_np(x, mult, 0, 1.0, 0, out_dtype="int32")
        prod = x.astype(np.float64) * mult
        want = np.floor(prod + 0.5)
        diff = np.abs(got.astype(np.float64) - want)
        assert (diff <= 1).all()
        # away from exact .5 midpoints the fixed-point path must agree
        frac = np.abs((prod + 0.5) - np.round(prod + 0.5))
        away = frac > 1e-6
        assert (diff[away] == 0).all()


def test_requantize_per_channel():
    rng = np.random.default_rng(5)
    x = rng.integers(-1000, 1000, size=(3, 4, 2), dtype=np.int64).astype(np.int32)
    scales = np.array([0.05, 0.2], dtype=np.float32)
    got = requantize_np(x, scales, 0, 0.1, 5, axis=2, out_dtype="int8")
    for c, s in enumerate(scales):
        want = requantize_np(x[..., c], float(s), 0, 0.1, 5, out_dtype="int8")
        np.testing.assert_array_equal(got[..., c], want)
