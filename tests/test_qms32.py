"""32-bit-emulated fixed-point multiply vs the int64 oracle — must be
bit-exact over the full (value, multiplier, shift, rounding) space."""

import numpy as np
import pytest

from tachikoma_tpu.ops.fixed_point import (
    TONEAREST,
    UPWARD,
    fixed_point_multiplier_shift,
    q_multiply_shift_np,
    q_multiply_shift_per_axis_np,
)
from tachikoma_tpu.ops.pallas.qms32 import plan_requantize, q_multiply_shift_u32


def _values(rng, n=4096):
    return np.concatenate([
        rng.integers(-(2**31), 2**31 - 1, size=n, dtype=np.int64),
        rng.integers(-(2**16), 2**16, size=n, dtype=np.int64),
        np.array([0, 1, -1, 127, -128, 2**31 - 1, -(2**31), 2**30, -(2**30)]),
    ]).astype(np.int32)


@pytest.mark.parametrize("rounding", [UPWARD, TONEAREST])
@pytest.mark.parametrize(
    "mult", [1e-6, 0.0003, 0.021, 0.25, 0.4999, 0.5, 0.75, 1.0 - 2**-31, 1.5, 3.75]
)
def test_qms32_bitexact(rng, rounding, mult):
    m, s = fixed_point_multiplier_shift(mult)
    xs = _values(rng)
    want = q_multiply_shift_np(xs, m, s, rounding)
    got = np.asarray(q_multiply_shift_u32(xs, m, s, rounding))
    np.testing.assert_array_equal(got, want, err_msg=f"mult={mult} rounding={rounding}")


@pytest.mark.parametrize("rounding", [UPWARD, TONEAREST])
def test_qms32_per_channel(rng, rounding):
    mults = np.array([0.003, 0.77, 1.25, 0.5, 0.031, 2.5, 0.124, 0.9999])
    ms, ss = plan_requantize(mults, 1.0)
    x = rng.integers(-(2**24), 2**24, size=(64, 8), dtype=np.int64).astype(np.int32)
    want = q_multiply_shift_per_axis_np(x, ms.astype(np.int64), ss.astype(np.int64), 1, rounding)
    got = np.asarray(q_multiply_shift_u32(x, ms[None, :], ss[None, :], rounding))
    np.testing.assert_array_equal(got, want)


def test_qms32_in_pallas_kernel(rng):
    """The same function must compile and run inside a Pallas kernel
    (interpret mode on CPU) bit-exactly."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    m, s = fixed_point_multiplier_shift(0.0217)
    x = rng.integers(-(2**24), 2**24, size=(64, 128), dtype=np.int64).astype(np.int32)

    def kernel(x_ref, o_ref):
        o_ref[:] = q_multiply_shift_u32(x_ref[:], m, s, UPWARD)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        interpret=True,
    )(x)
    want = q_multiply_shift_np(x, m, s, UPWARD)
    np.testing.assert_array_equal(np.asarray(out), want)


def test_qms_mixed_small_shifts(rng):
    """Randomized cross-check of the high-word fast paths for every shift in
    [-12, 0] — including n=32 (carry from lo) and n=31 (lo top bits)."""
    from tachikoma_tpu.ops.fixed_point import q_multiply_shift_np
    from tachikoma_tpu.ops.pallas.qms32 import (
        q_multiply_shift_select,
        q_multiply_shift_u32,
    )

    for trial in range(8):
        v = rng.integers(-2**31 + 1, 2**31 - 1, (64,), dtype=np.int64).astype(np.int32)
        m = rng.integers(2**30, 2**31 - 1, (64,), dtype=np.int64).astype(np.int32)
        s = rng.integers(-12, 1, (64,)).astype(np.int32)
        want = np.stack([
            q_multiply_shift_np(np.array([vv]), int(mm), int(ss))[0]
            for vv, mm, ss in zip(v, m, s)
        ])
        got = np.asarray(q_multiply_shift_u32(v, m, s))
        np.testing.assert_array_equal(want, got)
        svals = tuple(sorted({int(x) for x in s}))
        got2 = np.asarray(q_multiply_shift_select(v, m, np.asarray(s), svals))
        np.testing.assert_array_equal(want, got2)


# ---------------------------------------------------------------------------
# clamped requantize (plan_rq_clamp + fused_requantize) — the round-4 fast
# fused-epilogue path: clamp-to-saturation-window + 16/11-bit split folds
# ---------------------------------------------------------------------------

def _rq_ref(acc, m, s, zp, qmin, qmax, rounding):
    """Reference: full q_multiply_shift per channel + zp + clip."""
    from tachikoma_tpu.ops.fixed_point import q_multiply_shift_per_axis_np

    v = q_multiply_shift_per_axis_np(acc, m, s, axis=-1, rounding=rounding)
    return np.clip(v + zp, qmin, qmax)


def _rq_cases():
    rng = np.random.default_rng(11)
    for rounding in ("UPWARD", "TONEAREST"):
        for shifts, zp, q01 in [
            ((-6,), 0, False),            # tier-1 single shift
            ((-2, -4, -6), 3, False),     # tier-1 mixed (select tree)
            ((-8,), -5, False),           # tier-2 single
            ((-7, -9, -11), 2, False),    # tier-2 mixed
            ((-5,), 128, True),           # uint8 range [0, 255]
        ]:
            yield rng, rounding, shifts, zp, q01


def test_rq_clamp_matches_reference():
    from tachikoma_tpu.ops.pallas.qms32 import fused_requantize, plan_rq_clamp

    for rng, rounding, shifts, zp, q01 in _rq_cases():
        qmin, qmax = (0, 255) if q01 else (-128, 127)
        ch = 16
        m = rng.integers(2**30, 2**31 - 1, (ch,)).astype(np.int32)
        m[3] = 0  # dead channel: q == 0 everywhere
        s = np.asarray([shifts[i % len(shifts)] for i in range(ch)], np.int32)
        mode, rows = plan_rq_clamp(m, s, zp, qmin, qmax, rounding)
        assert mode == ("clamp16" if max(shifts) >= -6 and min(shifts) >= -6
                        else "clamp11"), (mode, shifts)
        # boundary-dense accs: window edges of every channel + extremes
        cols = []
        for c in range(ch):
            lo, hi = int(rows[1, c]), int(rows[2, c])
            vals = np.concatenate([
                np.arange(lo - 3, lo + 4), np.arange(hi - 3, hi + 4),
                rng.integers(lo, hi + 1, 50, endpoint=False)
                if hi > lo else np.zeros(50, np.int64),
                np.array([-2**31, 2**31 - 1, 0, 1, -1, 2**20, -2**20]),
            ])
            cols.append(vals)
        acc = np.stack(cols, axis=1).astype(np.int64).astype(np.int32)
        want = _rq_ref(acc, m, s, zp, qmin, qmax, rounding)
        svals = tuple(sorted({int(x) for x in s}))
        got = np.asarray(fused_requantize(
            acc, rows, s.reshape(1, ch), svals, rounding, zp, qmin, qmax,
            mode))
        np.testing.assert_array_equal(want, got)


def test_rq_clamp_ineligible_falls_back():
    from tachikoma_tpu.ops.pallas.qms32 import plan_rq_clamp

    m = np.full(4, 2**30 + 7, np.int32)
    # shift too shallow (n=32), too deep (n=43), positive shift, wide output
    assert plan_rq_clamp(m, np.full(4, -1, np.int32), 0, -128, 127,
                         "UPWARD")[0] is None
    assert plan_rq_clamp(m, np.full(4, -12, np.int32), 0, -128, 127,
                         "UPWARD")[0] is None
    assert plan_rq_clamp(m, np.full(4, 1, np.int32), 0, -128, 127,
                         "UPWARD")[0] is None
    assert plan_rq_clamp(m, np.full(4, -6, np.int32), 0, -(2**15), 2**15 - 1,
                         "UPWARD")[0] is None
    # unknown rounding
    assert plan_rq_clamp(m, np.full(4, -6, np.int32), 0, -128, 127,
                         "TIESAWAY")[0] is None


def test_rq_clamp_select_mode_passthrough():
    from tachikoma_tpu.ops.fixed_point import q_multiply_shift_np
    from tachikoma_tpu.ops.pallas.qms32 import fused_requantize

    rng = np.random.default_rng(5)
    acc = rng.integers(-2**25, 2**25, (32, 8)).astype(np.int32)
    m, s = 1518500250, -4
    want = np.clip(q_multiply_shift_np(acc, m, s) + 3, -128, 127)
    got = np.asarray(fused_requantize(
        acc, np.full((1, 8), m, np.int32), np.full((1, 8), s, np.int32),
        (s,), "UPWARD", 3, -128, 127, "select"))
    np.testing.assert_array_equal(want, got)
