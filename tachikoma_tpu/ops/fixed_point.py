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
    v = x.astype(np.int32)
    if input_zero_point != 0:
        v = v - np.int32(input_zero_point)
    in_scale = np.asarray(input_scale, dtype=np.float64)
    if in_scale.ndim == 0:
        if float(in_scale) != float(output_scale):
            m, s = fixed_point_multiplier_shift(float(in_scale) / float(output_scale))
            v = q_multiply_shift_np(v, m, s, rounding)
    else:
        mult = in_scale / float(output_scale)
        ms, ss = zip(*(fixed_point_multiplier_shift(float(d)) for d in mult))
        ax = axis if axis >= 0 else v.ndim + axis
        v = q_multiply_shift_per_axis_np(v, np.array(ms), np.array(ss), ax, rounding)
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

    v = x.astype(jnp.int32)
    if input_zero_point != 0:
        v = v - jnp.int32(input_zero_point)
    in_scale = np.asarray(input_scale, dtype=np.float64)
    if in_scale.ndim == 0:
        if float(in_scale) != float(output_scale):
            m, s = fixed_point_multiplier_shift(float(in_scale) / float(output_scale))
            v = q_multiply_shift_u32(v, m, s, rounding)
    else:
        mult = in_scale / float(output_scale)
        ms, ss = zip(*(fixed_point_multiplier_shift(float(d)) for d in mult))
        ax = axis if axis >= 0 else v.ndim + axis
        bshape = [1] * v.ndim
        bshape[ax] = -1
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
