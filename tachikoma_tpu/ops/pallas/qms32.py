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
    # Fast path (XLA allows data-dependent shift amounts, unlike Mosaic):
    # for UPWARD rounding with every shift <= -2 the exact result is
    # (hi + 2^(n-33)) asr (n-32) — the low product word never matters (see
    # q_multiply_shift_select).  Shift attrs are concrete at trace time.
    if rounding == "UPWARD" and not hasattr(shift, "aval"):
        s_conc = np.asarray(shift)
        if s_conc.size and (s_conc <= 0).all():
            hi, lo = _mulhi_s32(
                jnp.asarray(v).astype(jnp.int32), jnp.asarray(m, jnp.int32))
            hi = hi.astype(jnp.int32)
            n_np = (31 - s_conc.astype(np.int64)).astype(np.int32)  # [31, 62]
            if (s_conc <= -2).all():
                # addend + result wholly in the high word
                add = (np.int64(1) << np.maximum(n_np - 33, 0)).astype(np.int32)
                return (hi + jnp.asarray(add)) >> jnp.asarray(n_np - 32)
            # mixed shifts down to 0: n==32 needs lo's carry, n==31 its top bits
            n_j = jnp.asarray(n_np)
            add_big = jnp.asarray(
                np.where(n_np >= 33,
                         (np.int64(1) << np.maximum(n_np - 33, 0)), 0
                         ).astype(np.int32))
            r_big = (hi + add_big) >> jnp.maximum(n_j - jnp.int32(32), jnp.int32(0))
            r_32 = hi + (lo >> jnp.uint32(31)).astype(jnp.int32)
            lo2 = lo + jnp.uint32(1 << 30)
            c31 = (lo2 < lo).astype(jnp.int32)
            r_31 = ((hi + c31) << jnp.int32(1)) | (lo2 >> jnp.uint32(31)).astype(jnp.int32)
            return jnp.where(n_j >= jnp.int32(33), r_big,
                             jnp.where(n_j == jnp.int32(32), r_32, r_31))
    # NOTE: every scalar literal below is explicitly typed.  Under x64,
    # weakly-typed python ints become i64[] constants, and Mosaic (Pallas
    # TPU) lowers i64 convert_element_type with unbounded recursion.
    u0, u1, u31, u32c = (jnp.uint32(0), jnp.uint32(1), jnp.uint32(31), jnp.uint32(32))
    i0 = jnp.int32(0)
    v = v.astype(jnp.int32)
    m_arr = jnp.asarray(m, dtype=jnp.int32)
    s_arr = jnp.asarray(shift, dtype=jnp.int32)

    left = jnp.maximum(s_arr, i0).astype(jnp.uint32)
    right = jnp.maximum(-s_arr, i0)
    n = (right + jnp.int32(31)).astype(jnp.uint32)  # total right shift, [31, 62]

    vu = v.astype(jnp.uint32)
    mu = m_arr.astype(jnp.uint32)

    # 64-bit product P = v * m as signed (hi, lo):
    hi_u, lo = _mulhi_mullo_u32(vu, jnp.broadcast_to(mu, vu.shape))
    # unsigned->signed mulhi correction (m > 0 always):
    hi = hi_u - jnp.where(v < i0, mu, u0)

    # left shift (only when multiplier > 1):
    has_left = left > u0
    lshift_hi = (hi << left) | jnp.where(
        has_left, lo >> jnp.clip(u32c - left, u0, u31), u0
    )
    hi = jnp.where(has_left, lshift_hi, hi)
    lo = jnp.where(has_left, lo << left, lo)

    # rounding addend 2^(n-1):
    nm1 = n - u1  # in [30, 61]
    c_lo = jnp.where(nm1 < u32c, u1 << jnp.clip(nm1, u0, u31), u0)
    c_hi = jnp.where(nm1 >= u32c, u1 << jnp.clip(nm1 - u32c, u0, u31), u0)
    if rounding == "TONEAREST":
        # subtract 1 from the addend when the product is negative
        neg = hi.astype(jnp.int32) < i0
        borrow_c = (c_lo == u0) & neg  # c_lo - 1 wraps
        c_lo = c_lo - jnp.where(neg, u1, u0)
        c_hi = c_hi - jnp.where(borrow_c, u1, u0)
    lo2 = lo + c_lo
    carry = (lo2 < lo).astype(jnp.uint32)
    hi2 = hi + c_hi + carry

    # arithmetic shift right by n, truncated to low 32 bits (result fits i32)
    n_lt = jnp.clip(n, u0, u31)
    res_small = (lo2 >> n_lt) | (hi2 << jnp.clip(u32c - n_lt, u0, u31))
    res_big = (hi2.astype(jnp.int32) >> jnp.clip(n - u32c, u0, u31).astype(jnp.int32)).astype(
        jnp.uint32
    )
    res = jnp.where(n < u32c, res_small, jnp.where(n == u32c, hi2, res_big))
    return res.astype(jnp.int32)


def _mulhi_s32(v, m_arr):
    """(hi, lo) of the signed 64-bit product v * m (m > 0), sharing the
    16-bit-split partial products; v int32, m int32 broadcastable."""
    jnp = _ju()
    mask = jnp.uint32(0xFFFF)
    u0 = jnp.uint32(0)
    vu = v.astype(jnp.uint32)
    mu = jnp.broadcast_to(m_arr, v.shape).astype(jnp.uint32)
    a0 = vu & mask
    a1 = vu >> 16
    b0 = mu & mask
    b1 = mu >> 16
    t = a0 * b0
    u = a1 * b0 + (t >> 16)
    w = a0 * b1 + (u & mask)
    hi_u = a1 * b1 + (u >> 16) + (w >> 16)
    lo = (w << 16) | (t & mask)
    hi = hi_u - jnp.where(v < jnp.int32(0), mu, u0)  # signed correction
    return hi, lo


def q_multiply_shift_select(v, m, shift_vec, shift_values: tuple, rounding: str = "UPWARD"):
    """Per-channel fixed-point multiply for Mosaic (Pallas TPU), which
    rejects data-dependent shift amounts: branches over the DISTINCT shift
    values (static python ints) and selects elementwise, sharing the 64-bit
    product across branches.

    Fast path (the practical case: requantize ratios < 1/4, i.e. every
    shift <= -2, so the total right shift n = 31 - shift >= 33): for n >= 33
    the UPWARD-rounded result floor((P + 2^(n-1)) / 2^n) equals
    (hi + 2^(n-33)) asr (n-32) EXACTLY for any low word — because
    (P mod 2^32) < 2^n can never carry across the 2^n boundary once the
    constant addend sits wholly in the high word.  The low 32 bits are never
    materialized, cutting the epilogue to ~15 VPU ops/element + 3 per extra
    distinct shift.  Bit-exact vs the int64 reference (tests/test_qms32.py)."""
    jnp = _ju()
    svals = [int(s) for s in shift_values]
    fast = rounding == "UPWARD" and all(s <= 0 for s in svals)
    if not fast:
        if len(svals) == 1:
            return q_multiply_shift_u32(v, m, svals[0], rounding)
        out = jnp.zeros(v.shape, jnp.int32)
        for s_val in svals:
            r = q_multiply_shift_u32(v, m, s_val, rounding)
            out = jnp.where(shift_vec == jnp.int32(s_val), r, out)
        return out

    hi, lo = _mulhi_s32(v, m)
    hi = hi.astype(jnp.int32)

    def one(s_val):
        n = 31 - s_val                    # in [31, 62]
        if n >= 33:                       # addend + result wholly in hi
            hi2 = hi + jnp.int32(1 << (n - 33))
            return hi2 >> jnp.int32(n - 32)
        if n == 32:                       # s = -1: addend 2^31 carries via lo
            carry = (lo >> jnp.uint32(31)).astype(jnp.int32)
            return hi + carry
        # n == 31 (s = 0): P' >> 31 = 2*hi2 + (lo2 >> 31)
        lo2 = lo + jnp.uint32(1 << 30)
        carry = (lo2 < lo).astype(jnp.int32)
        hi2 = hi + carry
        return (hi2 << jnp.int32(1)) | (lo2 >> jnp.uint32(31)).astype(jnp.int32)

    if len(svals) == 1:
        return one(svals[0])
    out = jnp.zeros(v.shape, jnp.int32)
    for s_val in svals:
        out = jnp.where(shift_vec == jnp.int32(s_val), one(s_val), out)
    return out


# ---------------------------------------------------------------------------
# Clamped requantize: the fast fused-epilogue path (round 4).
#
# The full q_multiply_shift needs a 4-multiply 32-bit mulhi emulation
# (~15-21 VPU ops/element) — measured at the ResNet headline conv it costs
# as much as the MXU dots themselves (11.8 us of a 36.8 us kernel;
# scripts/r4_structure.py).  This path cuts it to ~8-10 ops:
#
#   1. CLAMP acc+bias to the per-channel window [blo, bhi] outside of which
#      the final int8 output saturates anyway.  q(v) = round(v*m*2^(s-31))
#      is monotone in v (m > 0), and because m < 2^(31-s) its steps are
#      0/+1, so both window ends ATTAIN qmin/qmax exactly: clamping first
#      provably never changes the final clipped output, for EVERY int32 acc.
#   2. With |v| <= 2^15 (tier "clamp16", total right shift n = 31-s <= 37)
#      the 64-bit product collapses to TWO int32 multiplies via a 16-bit
#      split of m and the floor identity
#          floor(z / 2^n) = floor((X + floor(Y / 2^16)) / 2^(n-16)),
#          z = X*2^16 + Y,  X = v*(m>>16) + cp,  Y = v*(m&0xffff) [- neg]
#      where cp = 2^(n-17) + zp*2^(n-16) folds BOTH the rounding constant
#      and the output zero point.  For n in [38, 42] ("clamp11", |v| <=
#      2^20) the same identity nests once more with an 11-bit split (three
#      multiplies).  TONEAREST subtracts [v<0] from the lowest limb.
#
# Exactness is proven by construction (pure floor identities, no rounding
# boundaries crossed) and verified exhaustively in tests/test_qms32.py.
# Measured: headline conv 36.8 -> 28.5 us (51.9% -> 65.7% of the MXU
# roofline), epilogue-only 12.5 -> 4.8 us at (28672, 128).
# ---------------------------------------------------------------------------


def _q_ref64(v: int, m: int, shift: int, rounding: str) -> int:
    """Scalar int reference of q_multiply_shift (host, arbitrary precision)."""
    left = shift if shift > 0 else 0
    right = -shift if shift < 0 else 0
    n = right + 31
    p = (int(v) << left) * int(m)
    r = 1 << (n - 1)
    if rounding == "TONEAREST" and p < 0:
        r -= 1
    return (p + r) >> n


def _smallest_ge(t: int, m: int, s: int, rounding: str) -> int:
    """Smallest v with q(v) >= t (q monotone, steps 0/+1 since m < 2^n)."""
    n = 31 - s
    v = -((-((2 * t - 1) << (n - 1))) // m)  # exact for UPWARD; +-1 else
    while _q_ref64(v, m, s, rounding) >= t:
        v -= 1
    while _q_ref64(v + 1, m, s, rounding) < t:
        v += 1
    return v + 1


def plan_rq_clamp(m_arr, s_arr, out_zp: int, qmin: int, qmax: int,
                  rounding: str):
    """Host-side eligibility + row computation for the clamped requantize.

    Returns (mode, rows) with mode in {"clamp16", "clamp11"} and rows a
    (4, n_ch) int32 array [m; blo; bhi; cp], or (None, None) when the
    clamped path does not apply (wide outputs, shifts outside [-11, -2],
    positive shifts, non-normalized multipliers whose saturation window
    exceeds the tier's int32 range)."""
    if rounding not in ("UPWARD", "TONEAREST"):
        return None, None
    if (qmax - qmin) > 510:  # int8/uint8-class outputs only
        return None, None
    m = np.atleast_1d(np.asarray(m_arr, np.int64)).ravel()
    s = np.atleast_1d(np.asarray(s_arr, np.int64)).ravel()
    m, s = (np.ascontiguousarray(a) for a in np.broadcast_arrays(m, s))
    if m.size == 0 or (m < 0).any() or (m >= (1 << 31)).any():
        return None, None
    n = 31 - s
    live = m > 0
    if live.any() and ((n[live] < 33).any() or (n[live] > 42).any()):
        return None, None
    mode = "clamp16" if (not live.any()) or (n[live] <= 37).all() \
        else "clamp11"
    blo = np.zeros_like(m)
    bhi = np.zeros_like(m)
    for i in range(m.size):
        if m[i] == 0:
            continue  # q == 0 for every v: clamp to [0, 0]
        blo[i] = _smallest_ge(qmin - out_zp, int(m[i]), int(s[i]), rounding)
        bhi[i] = _smallest_ge(qmax - out_zp + 1, int(m[i]), int(s[i]),
                              rounding) - 1
    bound = max(int(np.abs(blo).max()), int(np.abs(bhi).max()), 1)
    lim = (1 << 15) - 1 if mode == "clamp16" else (1 << 20) - 1
    if bound > lim:
        return None, None
    sb = 17 if mode == "clamp16" else 23
    cp = (np.int64(1) << (n - sb)) + np.int64(out_zp) * (
        np.int64(1) << (n - sb + 1))
    rows = np.stack([m, blo, bhi, cp]).astype(np.int32)
    return mode, rows


def fused_requantize(acc, m_rows, shift_vec, shift_values: tuple,
                     rounding: str, out_zp: int, qmin: int, qmax: int,
                     mode: str | None):
    """Kernel-side fused requantize: acc (int32, bias already added) ->
    int32 values already in [qmin+?, qmax] ready for the narrowing cast.

    mode None/"select": the existing q_multiply_shift_select path with
    explicit zero-point add and clip; m_rows is the (1, bn) multiplier row.
    mode "clamp16"/"clamp11": m_rows is the (4, bn) [m; blo; bhi; cp] block
    from plan_rq_clamp — clamp + 2 (or 3) multiplies, no final clip."""
    jnp = _ju()
    i32 = jnp.int32
    if mode in (None, "select"):
        m = m_rows[0:1] if getattr(m_rows, "ndim", 1) == 2 \
            and m_rows.shape[0] > 1 else m_rows
        v = q_multiply_shift_select(acc, m, shift_vec, shift_values, rounding)
        if out_zp:
            v = v + i32(out_zp)
        return jnp.clip(v, i32(qmin), i32(qmax))
    m, blo, bhi, cp = (m_rows[0:1], m_rows[1:2], m_rows[2:3], m_rows[3:4])
    v = jnp.clip(acc, blo, bhi)
    svals = [int(x) for x in shift_values]
    if mode == "clamp16":
        low = v * (m & i32(0xFFFF))
        if rounding == "TONEAREST":
            low = low - (v < i32(0)).astype(i32)
        t = v * (m >> i32(16)) + cp + (low >> i32(16))
        fsh = [31 - x - 16 for x in svals]
    elif mode == "clamp11":
        low = v * (m & i32(0x7FF))
        if rounding == "TONEAREST":
            low = low - (v < i32(0)).astype(i32)
        mid = (v * ((m >> i32(11)) & i32(0x7FF)) + (low >> i32(11))) >> i32(11)
        t = v * (m >> i32(22)) + cp + mid
        fsh = [31 - x - 22 for x in svals]
    else:
        raise ValueError(f"unknown requantize mode {mode!r}")
    if len(svals) == 1:
        return t >> i32(fsh[0])
    out = jnp.zeros(acc.shape, jnp.int32)
    for s_val, f in zip(svals, fsh):
        out = jnp.where(shift_vec == i32(s_val), t >> i32(f), out)
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
    return jnp.clip(v, jnp.int32(qmin), jnp.int32(qmax))


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
