"""Exact fixed-point multiply using only 32-bit integer ops.

Pallas TPU kernels (Mosaic) have no 64-bit integers, but the requantize
semantics (ops/fixed_point.py, mirroring `src/target/intrin_rule.cc:166`
QMultiplyShift) are defined on the full 64-bit product.  This module emulates
the int64 computation with u32 (hi, lo) pairs — bit-exact against
q_multiply_shift_np for every (value, multiplier, shift, rounding), verified
by tests/test_qms32.py — and is usable both inside Pallas kernels and as a
plain jnp function.

All shift amounts/multipliers may be scalars (static) or int32 arrays
broadcastable to the value shape (per-channel requantize).
"""

from __future__ import annotations

import numpy as np


def _ju():
    import jax.numpy as jnp

    return jnp


def _mulhi_mullo_u32(a_u, b_u):
    """(hi, lo) 32-bit halves of the 64-bit unsigned product a*b."""
    jnp = _ju()
    mask = jnp.uint32(0xFFFF)
    a0 = a_u & mask
    a1 = a_u >> 16
    b0 = b_u & mask
    b1 = b_u >> 16
    t = a0 * b0
    u = a1 * b0 + (t >> 16)
    w = a0 * b1 + (u & mask)
    hi = a1 * b1 + (u >> 16) + (w >> 16)
    lo = (w << 16) | (t & mask)
    return hi, lo


def q_multiply_shift_u32(v, m, shift, rounding: str = "UPWARD"):
    """Exact equivalent of fixed_point.q_multiply_shift using 32-bit ops.

    v: int32 array.  m: positive int32 multiplier (scalar or array).
    shift: int exponent (scalar or int32 array).  Returns int32.
    """
    jnp = _ju()
    v = v.astype(jnp.int32)
    m_arr = jnp.asarray(m, dtype=jnp.int32)
    s_arr = jnp.asarray(shift, dtype=jnp.int32)

    left = jnp.maximum(s_arr, 0).astype(jnp.uint32)
    right = jnp.maximum(-s_arr, 0)
    n = (right + 31).astype(jnp.uint32)  # total right shift, in [31, 62]

    vu = v.astype(jnp.uint32)
    mu = m_arr.astype(jnp.uint32)

    # 64-bit product P = v * m as signed (hi, lo):
    hi_u, lo = _mulhi_mullo_u32(vu, jnp.broadcast_to(mu, vu.shape))
    # unsigned->signed mulhi correction (m > 0 always):
    hi = hi_u - jnp.where(v < 0, mu, jnp.uint32(0))

    # left shift (only when multiplier > 1):
    has_left = left > 0
    lshift_hi = (hi << left) | jnp.where(
        has_left, lo >> jnp.clip(jnp.uint32(32) - left, 0, 31), jnp.uint32(0)
    )
    hi = jnp.where(has_left, lshift_hi, hi)
    lo = jnp.where(has_left, lo << left, lo)

    # rounding addend 2^(n-1):
    nm1 = n - 1  # in [30, 61]
    c_lo = jnp.where(nm1 < 32, jnp.uint32(1) << jnp.clip(nm1, 0, 31), jnp.uint32(0))
    c_hi = jnp.where(nm1 >= 32, jnp.uint32(1) << jnp.clip(nm1 - 32, 0, 31), jnp.uint32(0))
    if rounding == "TONEAREST":
        # subtract 1 from the addend when the product is negative
        neg = hi.astype(jnp.int32) < 0
        borrow_c = (c_lo == 0) & neg  # c_lo - 1 wraps
        c_lo = c_lo - jnp.where(neg, jnp.uint32(1), jnp.uint32(0))
        c_hi = c_hi - jnp.where(borrow_c, jnp.uint32(1), jnp.uint32(0))
    lo2 = lo + c_lo
    carry = (lo2 < lo).astype(jnp.uint32)
    hi2 = hi + c_hi + carry

    # arithmetic shift right by n, truncated to low 32 bits (result fits i32)
    n_lt = jnp.clip(n, 0, 31)
    res_small = (lo2 >> n_lt) | (hi2 << jnp.clip(jnp.uint32(32) - n_lt, 0, 31))
    res_big = (hi2.astype(jnp.int32) >> jnp.clip(n - 32, 0, 31).astype(jnp.int32)).astype(
        jnp.uint32
    )
    res = jnp.where(n < 32, res_small, jnp.where(n == 32, hi2, res_big))
    return res.astype(jnp.int32)


def q_multiply_shift_select(v, m, shift_vec, shift_values: tuple, rounding: str = "UPWARD"):
    """Per-channel fixed-point multiply for Mosaic (Pallas TPU), which
    rejects data-dependent shift amounts: computes the scalar-shift kernel
    once per DISTINCT shift value (static python ints) and selects
    elementwise.  Per-channel scale sets span only a few octaves, so
    len(shift_values) is small (typically <= 4).  Bit-exact vs the int64
    reference (verified on hardware)."""
    jnp = _ju()
    if len(shift_values) == 1:
        return q_multiply_shift_u32(v, m, int(shift_values[0]), rounding)
    out = jnp.zeros(v.shape, jnp.int32)
    for s_val in shift_values:
        r = q_multiply_shift_u32(v, m, int(s_val), rounding)
        out = jnp.where(shift_vec == jnp.int32(s_val), r, out)
    return out


def requantize_epilogue(acc, multiplier, shift, out_zp: int,
                        rounding: str = "UPWARD", qmin: int = -128, qmax: int = 127):
    """Fused requantize epilogue for int32 accumulators (per-tensor or
    per-channel m/shift arrays broadcast over the last axis); returns int32
    values already clipped to [qmin, qmax] (cast to int8 outside the kernel
    or at the store)."""
    jnp = _ju()
    v = q_multiply_shift_u32(acc, multiplier, shift, rounding)
    if out_zp:
        v = v + jnp.int32(out_zp)
    return jnp.clip(v, qmin, qmax)


def plan_requantize(input_scale, output_scale: float):
    """(multiplier, shift) int32 arrays (or scalars) for scale ratios."""
    from ..fixed_point import fixed_point_multiplier_shift

    scales = np.asarray(input_scale, dtype=np.float64) / float(output_scale)
    if scales.ndim == 0:
        return fixed_point_multiplier_shift(float(scales))
    ms, ss = zip(*(fixed_point_multiplier_shift(float(s)) for s in scales.ravel()))
    return (
        np.array(ms, dtype=np.int32).reshape(scales.shape),
        np.array(ss, dtype=np.int32).reshape(scales.shape),
    )
