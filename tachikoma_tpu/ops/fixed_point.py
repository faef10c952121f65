"""Exact fixed-point arithmetic — the bit-exactness core.

Re-implements, with identical integer semantics, the reference's requantize
machinery:

  * `GetFixedPointMultiplierShift` (`src/relay/qnn/utils.cc:33`): decompose a
    positive double multiplier into (int32 significand with the binary point
    between bits 31/30, int exponent).
  * UPWARD rounding fixed-point multiply — the `tir.q_multiply_shift`
    legalization (`src/target/intrin_rule.cc:166-195 QMultiplyShift`):
    64-bit product, add 2^(n-1), arithmetic shift right n.
  * TONEAREST rounding — `FixedPointMultiplyToNearest`
    (`src/relay/qnn/utils.cc:59-110`): like UPWARD but the rounding addend is
    2^(n-1)-1 when the 64-bit product is negative (round half away from zero).

All functions are pure and defined for both numpy (oracle) and jax.numpy
(XLA/TPU path) backends; integer wraparound (two's complement) semantics are
relied on throughout, which numpy and XLA share.
"""

from __future__ import annotations

import math

import numpy as np

UPWARD = "UPWARD"
TONEAREST = "TONEAREST"


def fixed_point_multiplier_shift(double_multiplier: float) -> tuple[int, int]:
    """float multiplier -> (int32 significand, exponent).

    Bit-for-bit port of the semantics of `GetFixedPointMultiplierShift`
    (`src/relay/qnn/utils.cc:33-60`, itself credited to TFLite).
    """
    if double_multiplier == 0.0:
        return 0, 0
    significand_d, exponent = math.frexp(double_multiplier)
    significand = int(round(significand_d * (1 << 31)))
    assert significand <= (1 << 31)
    if significand == (1 << 31):
        significand //= 2
        exponent += 1
    assert significand <= np.iinfo(np.int32).max
    return significand, exponent


def _shifts(shift: int) -> tuple[int, int]:
    left = shift if shift > 0 else 0
    right = -shift if shift < 0 else 0
    return left, right


def q_multiply_shift_np(x: np.ndarray, m: int, shift: int, rounding: str = UPWARD) -> np.ndarray:
    """Exact numpy fixed-point multiply: int32 tensor x by multiplier m*2^shift.

    UPWARD path matches `QMultiplyShift` (`src/target/intrin_rule.cc:166`);
    TONEAREST path matches `FixedPointMultiplyToNearest`
    (`src/relay/qnn/utils.cc:59`).  q = 31 always (int32 significand).
    """
    left, right = _shifts(int(shift))
    v = x.astype(np.int64)
    if left:
        v = v << np.int64(left)
    v = v * np.int64(m)
    total_right = right + 31
    pos_round = np.int64(1) << np.int64(total_right - 1)
    if rounding == UPWARD:
        v = v + pos_round
    elif rounding == TONEAREST:
        v = v + np.where(v >= 0, pos_round, pos_round - 1)
    else:
        raise ValueError(f"unknown rounding {rounding!r}")
    v = v >> np.int64(total_right)
    return v.astype(np.int32)


def q_multiply_shift_per_axis_np(
    x: np.ndarray, ms: np.ndarray, shifts: np.ndarray, axis: int, rounding: str = UPWARD
) -> np.ndarray:
    """Per-channel variant (`tir.q_multiply_shift_per_axis`,
    `src/target/intrin_rule.cc:252` / `FixedPointMultiplyPerChannel`,
    `src/relay/qnn/utils.cc:112`)."""
    ms = np.asarray(ms, dtype=np.int64)
    shifts = np.asarray(shifts, dtype=np.int64)
    bshape = [1] * x.ndim
    bshape[axis] = -1
    m_b = ms.reshape(bshape)
    left = np.where(shifts > 0, shifts, 0).reshape(bshape)
    right = np.where(shifts < 0, -shifts, 0).reshape(bshape)
    v = x.astype(np.int64)
    v = np.where(left > 0, v << left, v)
    v = v * m_b
    total_right = right + 31
    pos_round = np.int64(1) << (total_right - 1)
    if rounding == UPWARD:
        v = v + pos_round
    elif rounding == TONEAREST:
        v = v + np.where(v >= 0, pos_round, pos_round - 1)
    else:
        raise ValueError(f"unknown rounding {rounding!r}")
    v = v >> total_right
    return v.astype(np.int32)


def requantize_np(
    x: np.ndarray,
    input_scale,
    input_zero_point: int,
    output_scale: float,
    output_zero_point: int,
    axis: int = -1,
    rounding: str = UPWARD,
    out_dtype: str = "int8",
) -> np.ndarray:
    """Exact integer requantize (`RequantizeLowerInt`,
    `src/relay/qnn/op/requantize.cc:195-260`):

      1. subtract input zero point (int32)
      2. fixed-point multiply by input_scale/output_scale
      3. add output zero point
      4. clip to out_dtype range, cast
    """
    wide = str(x.dtype) == "int64"  # W8A16 accumulators exceed int32
    v = x.astype(np.int64 if wide else np.int32)
    if input_zero_point != 0:
        v = v - (np.int64 if wide else np.int32)(input_zero_point)
    in_scale = np.asarray(input_scale, dtype=np.float64)
    if in_scale.ndim == 0:
        if float(in_scale) != float(output_scale):
            m, s = fixed_point_multiplier_shift(float(in_scale) / float(output_scale))
            v = (q_multiply_shift_wide_np(v, m, s, rounding) if wide
                 else q_multiply_shift_np(v, m, s, rounding))
    else:
        mult = in_scale / float(output_scale)
        ms, ss = zip(*(fixed_point_multiplier_shift(float(d)) for d in mult))
        ax = axis if axis >= 0 else v.ndim + axis
        v = (q_multiply_shift_wide_per_axis_np(
                 v, np.array(ms), np.array(ss), ax, rounding) if wide
             else q_multiply_shift_per_axis_np(
                 v, np.array(ms), np.array(ss), ax, rounding))
    if output_zero_point != 0:
        v = v + np.int32(output_zero_point)
    lo, hi = np.iinfo(np.dtype(out_dtype)).min, np.iinfo(np.dtype(out_dtype)).max
    return np.clip(v, lo, hi).astype(out_dtype)


# ---------------------------------------------------------------------------
# JAX versions.  Imported lazily so the numpy oracle has no jax dependency.
# ---------------------------------------------------------------------------

def q_multiply_shift_jnp(x, m: int, shift: int, rounding: str = UPWARD):
    """Exact jnp fixed-point multiply.

    UPWARD with shift <= 0 (every practical requantize: ratios < 1) takes
    the 32-bit high-word path shared with the Pallas epilogue
    (`pallas/qms32.py` — an exact algebraic rewrite, so still bit-identical
    to `q_multiply_shift_np`): int64 arithmetic on TPU is emulated by XLA
    and dominates elementwise requantize/qnn.add time otherwise.
    """
    import jax.numpy as jnp

    if rounding == UPWARD and int(shift) <= 0 and int(m) > 0:
        from .pallas.qms32 import q_multiply_shift_select

        return q_multiply_shift_select(
            x.astype(jnp.int32), jnp.int32(int(m)), jnp.int32(int(shift)),
            (int(shift),), rounding)

    left, right = _shifts(int(shift))
    v = x.astype(jnp.int64)
    if left:
        v = v << left
    v = v * jnp.int64(m)
    total_right = right + 31
    pos_round = np.int64(1) << np.int64(total_right - 1)
    if rounding == UPWARD:
        v = v + pos_round
    elif rounding == TONEAREST:
        v = v + jnp.where(v >= 0, jnp.int64(pos_round), jnp.int64(pos_round - 1))
    else:
        raise ValueError(f"unknown rounding {rounding!r}")
    v = v >> total_right
    return v.astype(jnp.int32)


def q_multiply_shift_per_axis_jnp(x, ms, shifts, axis: int, rounding: str = UPWARD):
    import jax.numpy as jnp

    shifts_i = np.asarray(shifts, np.int64)
    if (rounding == UPWARD and (shifts_i <= 0).all()
            and (np.asarray(ms, np.int64) > 0).all()):
        # 32-bit high-word path (see q_multiply_shift_jnp)
        from .pallas.qms32 import q_multiply_shift_select

        bshape = [1] * x.ndim
        bshape[axis] = -1
        m_b = jnp.asarray(np.asarray(ms, np.int32).reshape(bshape))
        s_b = jnp.asarray(shifts_i.astype(np.int32).reshape(bshape))
        return q_multiply_shift_select(
            x.astype(jnp.int32), m_b, s_b,
            tuple(sorted({int(s) for s in shifts_i})), rounding)

    ms = np.asarray(ms, dtype=np.int64)
    shifts = np.asarray(shifts, dtype=np.int64)
    bshape = [1] * x.ndim
    bshape[axis] = -1
    m_b = jnp.asarray(ms.reshape(bshape))
    left = np.where(shifts > 0, shifts, 0).reshape(bshape)
    right = np.where(shifts < 0, -shifts, 0).reshape(bshape)
    v = x.astype(jnp.int64)
    v = jnp.where(jnp.asarray(left > 0), v << jnp.asarray(left), v)
    v = v * m_b
    total_right = jnp.asarray(right + 31)
    pos_round = jnp.int64(1) << (total_right - 1)
    if rounding == UPWARD:
        v = v + pos_round
    elif rounding == TONEAREST:
        v = v + jnp.where(v >= 0, pos_round, pos_round - 1)
    else:
        raise ValueError(f"unknown rounding {rounding!r}")
    v = v >> total_right
    return v.astype(jnp.int32)


def requantize_jnp(
    x,
    input_scale,
    input_zero_point: int,
    output_scale: float,
    output_zero_point: int,
    axis: int = -1,
    rounding: str = UPWARD,
    out_dtype: str = "int8",
):
    """XLA requantize.  Uses the 32-bit emulation of the 64-bit fixed-point
    multiply (ops/pallas/qms32.py, bit-exact vs the int64 reference) — int64
    is emulated and ~100x slower on TPU VPUs."""
    import jax.numpy as jnp

    from .pallas.qms32 import q_multiply_shift_u32

    wide = str(x.dtype) == "int64"  # W8A16 accumulators exceed int32
    v = x.astype(jnp.int64 if wide else jnp.int32)
    if input_zero_point != 0:
        v = v - (jnp.int64(input_zero_point) if wide
                 else jnp.int32(input_zero_point))
    in_scale = np.asarray(input_scale, dtype=np.float64)

    # clamped fast path (qms32.plan_rq_clamp): ~half the VPU ops of the
    # mulhi emulation and no int64; exactness by construction (see qms32).
    # Last-axis (or per-tensor) channel layout only — other axes fall back.
    ax = axis if axis >= 0 else v.ndim + axis
    if not wide and v.ndim >= 2 and (in_scale.ndim == 0 or ax == v.ndim - 1):
        from .pallas.qms32 import fused_requantize, plan_rq_clamp

        ratios = in_scale / float(output_scale)
        if in_scale.ndim == 0 and float(in_scale) == float(output_scale):
            pass  # identity multiply: keep the cheap no-multiply path below
        else:
            ms, ss = zip(*(fixed_point_multiplier_shift(float(d))
                           for d in np.atleast_1d(ratios).ravel()))
            ms = np.asarray(ms, np.int32)
            ss = np.asarray(ss, np.int32)
            lo = np.iinfo(np.dtype(out_dtype)).min
            hi = np.iinfo(np.dtype(out_dtype)).max
            mode, rows = plan_rq_clamp(ms, ss, int(output_zero_point),
                                       int(lo), int(hi), rounding)
            if mode is not None:
                out = fused_requantize(
                    v, jnp.asarray(rows), jnp.asarray(ss.reshape(1, -1)),
                    tuple(sorted({int(s) for s in ss})), rounding,
                    int(output_zero_point), int(lo), int(hi), mode)
                return out.astype(out_dtype)
    if in_scale.ndim == 0:
        if float(in_scale) != float(output_scale):
            m, s = fixed_point_multiplier_shift(float(in_scale) / float(output_scale))
            v = (q_multiply_shift_wide_jnp(v, m, s, rounding) if wide
                 else q_multiply_shift_u32(v, m, s, rounding))
    else:
        mult = in_scale / float(output_scale)
        ms, ss = zip(*(fixed_point_multiplier_shift(float(d)) for d in mult))
        ax = axis if axis >= 0 else v.ndim + axis
        bshape = [1] * v.ndim
        bshape[ax] = -1
        if wide:
            v = q_multiply_shift_wide_jnp(
                v, np.array(ms, np.int64).reshape(bshape),
                np.array(ss, np.int64).reshape(bshape), rounding)
        else:
            v = q_multiply_shift_u32(
                v,
                np.array(ms, np.int32).reshape(bshape),
                np.array(ss, np.int32).reshape(bshape),
                rounding,
            )
    if output_zero_point != 0:
        v = v + jnp.int32(output_zero_point)
    lo, hi = np.iinfo(np.dtype(out_dtype)).min, np.iinfo(np.dtype(out_dtype)).max
    return jnp.clip(v, jnp.int32(lo), jnp.int32(hi)).astype(out_dtype)


# ---------------------------------------------------------------------------
# Wide (int64-accumulator) fixed-point multiply — the W8A16 requantize core.
# ---------------------------------------------------------------------------
# int16 activations x int8 weights accumulate past int32 (k*32767*127 ≈
# 2^22 * k), and (acc * m) overflows int64 outright.  The product is built
# exactly in two 64-bit limbs (base 2^32), rounding is added into the limbs,
# and the arithmetic shift reads the result out of the limb pair — exact
# floor semantics for ANY int64 input (cross-checked against Python bignum
# arithmetic in tests/test_fixed_point.py).

_MASK32 = np.int64(0xFFFFFFFF)


def _wide_mul_limbs(v, m):
    """v (int64 array) * m (positive int64 scalar/array) -> (hi, lo32):
    exact value = hi * 2^32 + lo32 with 0 <= lo32 < 2^32."""
    x_hi = v >> np.int64(32)                  # arithmetic: carries sign
    x_lo = v & _MASK32                        # 0 .. 2^32-1
    p_lo = x_lo * m                           # < 2^63, nonneg
    hi = x_hi * m + (p_lo >> np.int64(32))
    lo = p_lo & _MASK32
    return hi, lo


def _wide_round_shift(hi, lo, total_right, rounding, neg, xp=np):
    """floor((hi*2^32 + lo + R) / 2^total_right) with R the rounding bias.

    total_right is always CONCRETE numpy (derived from static shifts);
    hi/lo/neg may be traced — xp selects numpy vs jax.numpy for the
    value-dependent where()s."""
    t = total_right
    # rounding bias 2^(t-1) (TONEAREST: minus 1 for negative values)
    bias_lo = np.where(t - 1 < 32, np.int64(1) << np.minimum(
        np.maximum(t - 1, 0), 31), np.int64(0))
    bias_hi = np.where(t - 1 >= 32, np.int64(1) << np.maximum(t - 33, 0),
                       np.int64(0))
    if rounding == TONEAREST:
        low_bias = t - 1 < 32
        bias_lo = xp.where(xp.asarray(neg) & xp.asarray(low_bias),
                           bias_lo - 1, bias_lo)
        # t-1>=32: bias 2^(t-1) - 1 = (2^(t-33) limbs) - 1 ulp, applied
        # below as a borrow-aware subtract from lo
        sub1 = xp.asarray(neg) & xp.asarray(t - 1 >= 32)
    else:
        sub1 = xp.zeros(np.shape(hi), dtype=bool)
    lo = lo + bias_lo
    hi = hi + bias_hi + (lo >> np.int64(32))
    lo = lo & _MASK32
    lo = lo - xp.where(sub1, np.int64(1), np.int64(0))
    hi = hi + (lo >> np.int64(32))            # borrow if lo went negative
    lo = lo & _MASK32
    out_hi = hi >> np.minimum(np.maximum(t - 32, 0), 63)
    out_lt = (hi << np.minimum(np.maximum(32 - t, 0), 63)) | (
        lo >> np.minimum(t, 63))
    return xp.where(xp.asarray(t >= 32), out_hi, out_lt)


def q_multiply_shift_wide_np(x, m: int, shift: int,
                             rounding: str = UPWARD) -> np.ndarray:
    """Exact (x * m * 2^shift) >> 31 with round-to-nearest for int64 x."""
    left, right = _shifts(int(shift))
    v = x.astype(np.int64)
    if left:
        v = v << np.int64(left)
    hi, lo = _wide_mul_limbs(v, np.int64(int(m)))
    t = np.int64(right + 31)
    neg = v < 0
    return _wide_round_shift(hi, lo, np.broadcast_to(t, hi.shape).copy(),
                             rounding, neg)


def q_multiply_shift_wide_per_axis_np(x, ms, shifts, axis: int,
                                      rounding: str = UPWARD) -> np.ndarray:
    ms = np.asarray(ms, np.int64)
    shifts = np.asarray(shifts, np.int64)
    bshape = [1] * x.ndim
    bshape[axis] = -1
    m_b = np.broadcast_to(ms.reshape(bshape), x.shape)
    left = np.maximum(shifts, 0).reshape(bshape)
    right = np.maximum(-shifts, 0).reshape(bshape)
    v = x.astype(np.int64) << np.broadcast_to(left, x.shape)
    hi, lo = _wide_mul_limbs(v, m_b)
    t = np.broadcast_to(right + 31, x.shape).astype(np.int64).copy()
    return _wide_round_shift(hi, lo, t, rounding, v < 0)


def q_multiply_shift_wide_jnp(x, m, shift, rounding: str = UPWARD):
    """JAX twin of the wide multiply (int64 emulated on TPU — a capability
    path for W8A16, not a hot path).  Scalar or per-axis: m/shift may be
    broadcast-shaped CONCRETE numpy arrays."""
    import jax.numpy as jnp

    ms = np.asarray(m, np.int64)
    shifts = np.asarray(shift, np.int64)
    left = np.maximum(shifts, 0)
    right = np.maximum(-shifts, 0)
    v = x.astype(jnp.int64)
    if np.any(left):
        v = v << jnp.asarray(np.broadcast_to(left, np.shape(x))
                             if left.ndim else left)
    hi, lo = _wide_mul_limbs(v, jnp.asarray(ms))
    t = np.broadcast_to(right + 31, np.shape(x)).astype(np.int64)
    return _wide_round_shift(hi, lo, t, rounding, v < 0, xp=jnp)
