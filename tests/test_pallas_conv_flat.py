"""Flat shifted-matmul Pallas conv vs the oracle — bit-exact (interpret mode
on CPU; identical kernel code compiles for TPU)."""

import numpy as np
import pytest

from tachikoma_tpu.ir.graph import Node
from tachikoma_tpu.ir.registry import get_op
from tachikoma_tpu.ops.fixed_point import requantize_np
from tachikoma_tpu.ops.pallas.conv_flat import (
    qconv2d_flat,
    qconv2d_flat_supported,
)
from tachikoma_tpu.ops.pallas.qms32 import plan_requantize


def oracle(x, w, bias, scales, out_scale, ozp, strides, padding, groups, izp):
    node = Node(
        "c", "qnn.conv2d", ("d", "w"),
        {"strides": strides, "padding": padding, "groups": groups,
         "input_zero_point": izp, "kernel_zero_point": 0, "out_dtype": "int32"},
    )
    acc = get_op("qnn.conv2d").np_impl(x, w, node=node)
    if bias is not None:
        acc = acc + bias.reshape(1, 1, 1, -1)
    return requantize_np(acc, scales, 0, out_scale, ozp, axis=3, out_dtype="int8")


@pytest.mark.parametrize(
    "shape,k,strides,padding,groups",
    [
        ((1, 14, 14, 64), 3, (1, 1), (1, 1, 1, 1), 1),
        ((2, 9, 9, 32), 3, (2, 2), (1, 1, 1, 1), 1),      # polyphase stride 2
        ((1, 8, 8, 40), 3, (1, 1), (0, 0, 0, 0), 1),      # unaligned cin/cout
        ((1, 10, 10, 32), 1, (1, 1), (0, 0, 0, 0), 1),    # 1x1 -> matmul
        ((1, 11, 11, 32), 1, (2, 2), (0, 0, 0, 0), 1),    # 1x1 stride 2
        ((2, 7, 7, 24), 5, (3, 3), (2, 2, 2, 2), 1),      # odd k, stride 3
        ((1, 12, 12, 128), 3, (1, 1), (1, 1, 1, 1), 128),   # depthwise
        ((1, 11, 11, 96), 3, (2, 2), (1, 1, 1, 1), 96),     # dw stride 2
        ((1, 14, 14, 160), 5, (2, 2), (2, 2, 2, 2), 160),   # dw 5x5 stride 2
        ((1, 20, 20, 8), 7, (2, 2), (3, 3, 3, 3), 1),       # stem-like 7x7 s2
        ((3, 13, 13, 16), 3, (1, 1), (1, 1, 1, 1), 1),      # odd batch tight
        ((1, 6, 6, 24), 5, (1, 1), (2, 2, 2, 2), 1),        # k5 small image
        ((2, 8, 8, 16), 3, (1, 1), (0, 1, 0, 1), 1),        # asymmetric pad
    ],
)
def test_flat_conv_bitexact(rng, shape, k, strides, padding, groups):
    n, h, w_, cin = shape
    cout = cin if groups > 1 else 48
    x = rng.integers(-127, 127, shape).astype(np.int8)
    w = rng.integers(-127, 127, (k, k, cin // groups, cout)).astype(np.int8)
    bias = rng.integers(-2000, 2000, cout).astype(np.int32)
    scales = 0.0002 + np.abs(rng.standard_normal(cout)) * 0.0005
    m_arr, s_arr = plan_requantize(scales, 0.07)
    assert qconv2d_flat_supported(shape, w.shape, strides, padding, groups)
    got = np.asarray(
        qconv2d_flat(
            x, w, bias=bias, multiplier=m_arr, shift=s_arr,
            strides=strides, padding=padding, groups=groups, out_zp=4,
        )
    )
    want = oracle(x, w, bias, scales, 0.07, 4, strides, padding, groups, 0)
    np.testing.assert_array_equal(got, want)


def test_flat_conv_input_zero_point(rng):
    """Nonzero input zp folds into the bias; izp-padded borders + polyphase
    phase padding must stay exact."""
    for strides in [(1, 1), (2, 2)]:
        x = rng.integers(-128, 127, (1, 9, 9, 32)).astype(np.int8)
        w = rng.integers(-127, 127, (3, 3, 32, 32)).astype(np.int8)
        m, s = plan_requantize(0.0004, 0.05)
        got = np.asarray(
            qconv2d_flat(
                x, w, multiplier=m, shift=s, strides=strides,
                padding=(1, 1, 1, 1), input_zero_point=7,
            )
        )
        want = oracle(x, w, None, 0.0004, 0.05, 0, strides, (1, 1, 1, 1), 1, 7)
        np.testing.assert_array_equal(got, want)


def test_flat_conv_raw_acc(rng):
    """Unfused mode returns the exact int32 accumulator (+bias)."""
    x = rng.integers(-127, 127, (1, 8, 8, 32)).astype(np.int8)
    w = rng.integers(-127, 127, (3, 3, 32, 16)).astype(np.int8)
    node = Node("c", "qnn.conv2d", ("d", "w"),
                {"strides": (1, 1), "padding": (1, 1, 1, 1), "groups": 1,
                 "out_dtype": "int32"})
    want = get_op("qnn.conv2d").np_impl(x, w, node=node)
    got = np.asarray(qconv2d_flat(x, w, strides=(1, 1), padding=(1, 1, 1, 1)))
    np.testing.assert_array_equal(got, want)


def test_flat_conv_transposed_layout(rng):
    """layout='t' (lane-shift kernel) is bit-identical to the default."""
    x = rng.integers(-127, 127, (2, 10, 10, 32)).astype(np.int8)
    w = rng.integers(-127, 127, (3, 3, 32, 48)).astype(np.int8)
    bias = rng.integers(-2000, 2000, 48).astype(np.int32)
    scales = 0.0002 + np.abs(rng.standard_normal(48)) * 0.0005
    m_arr, s_arr = plan_requantize(scales, 0.07)
    kw = dict(bias=bias, multiplier=m_arr, shift=s_arr,
              strides=(1, 1), padding=(1, 1, 1, 1), out_zp=4)
    a = np.asarray(qconv2d_flat(x, w, **kw))
    b = np.asarray(qconv2d_flat(x, w, layout="t", **kw))
    np.testing.assert_array_equal(a, b)


def test_flat_conv_s_w_layouts(rng):
    """layout='s' (scratch im2col, one deep-K dot) and layout='w' (wide-N dot
    + int32 shifted combines) are bit-identical to the default kernel."""
    x = rng.integers(-127, 127, (2, 10, 10, 32)).astype(np.int8)
    w = rng.integers(-127, 127, (3, 3, 32, 48)).astype(np.int8)
    bias = rng.integers(-2000, 2000, 48).astype(np.int32)
    scales = 0.0002 + np.abs(rng.standard_normal(48)) * 0.0005
    m_arr, s_arr = plan_requantize(scales, 0.07)
    kw = dict(bias=bias, multiplier=m_arr, shift=s_arr,
              strides=(1, 1), padding=(1, 1, 1, 1), out_zp=4)
    a = np.asarray(qconv2d_flat(x, w, **kw))
    for lay in ("s", "w", "r"):
        b = np.asarray(qconv2d_flat(x, w, layout=lay, **kw))
        np.testing.assert_array_equal(a, b)


def test_flat_conv_im2col_fallback(rng):
    """Big-image im2col route (stem convs) is bit-exact vs the oracle."""
    from tachikoma_tpu.ops.pallas.conv_flat import _pick_conv_blocks

    x = rng.integers(-127, 127, (1, 40, 40, 3)).astype(np.int8)
    w = rng.integers(-127, 127, (7, 7, 3, 16)).astype(np.int8)
    m_arr, s_arr = plan_requantize(0.0004 + np.zeros(16), 0.05)
    got = np.asarray(qconv2d_flat(
        x, w, multiplier=m_arr, shift=s_arr, strides=(2, 2),
        padding=(3, 3, 3, 3), input_zero_point=5,
        blocks=None))
    want = oracle(x, w, None, 0.0004 + np.zeros(16), 0.05, 0,
                  (2, 2), (3, 3, 3, 3), 1, 5)
    np.testing.assert_array_equal(got, want)


def test_flat_conv_rejects_untileable_blocks(rng):
    """Explicit blocks whose N/K block exceeds (or does not divide) the
    padded channel dims must raise — a bn > cout_p grid has ZERO N cells,
    so the output buffer is never written (garbage at launch-overhead
    speed; this poisoned on-chip tune records in round 3)."""
    import pytest

    x = rng.integers(-127, 127, (2, 10, 10, 128)).astype(np.int8)
    w = rng.integers(-127, 127, (3, 3, 128, 128)).astype(np.int8)
    m_arr, s_arr = plan_requantize(0.0004 + np.zeros(128), 0.05)
    kw = dict(multiplier=m_arr, shift=s_arr, strides=(1, 1),
              padding=(1, 1, 1, 1))
    for bad in ((512, 256, 128), (512, 128, 256), (512, 96, 128),
                (512, 128, 0)):
        with pytest.raises(ValueError):
            qconv2d_flat(x, w, blocks=bad, **kw)


def test_flat_conv_ignores_invalid_db_config(rng, tmp_path, monkeypatch):
    """A stale DB record with an untileable block geometry is skipped in
    favour of the auto pick (execution must never trust a foreign DB)."""
    from tachikoma_tpu.tune import database as tdb
    from tachikoma_tpu.ops.pallas.conv_flat import flat_conv_workload

    x = rng.integers(-127, 127, (2, 10, 10, 128)).astype(np.int8)
    w = rng.integers(-127, 127, (3, 3, 128, 128)).astype(np.int8)
    m_arr, s_arr = plan_requantize(0.0004 + np.zeros(128), 0.05)
    kw = dict(multiplier=m_arr, shift=s_arr, strides=(1, 1),
              padding=(1, 1, 1, 1))
    want = np.asarray(qconv2d_flat(x, w, blocks=(512, 128, 128), **kw))

    wl = flat_conv_workload(2, 10, 10, 128, 128, 3, 3, (1, 1), True)
    monkeypatch.setattr(tdb, "lookup_config",
                        lambda w_, **k: {"blocks": [512, 256, 128]}
                        if w_ == wl else None)
    got = np.asarray(qconv2d_flat(x, w, **kw))  # blocks=None -> DB path
    np.testing.assert_array_equal(got, want)


def test_stem_f32_route_exact(rng):
    """Big-image small-cin convs (the ResNet 7x7 s2 stem regime) route to
    the XLA f32 conv with the exact fixed-point epilogue — bit-identical to
    the numpy oracle (int8 operands are exact in bf16 and every partial sum
    is an integer < 2^24, so the f32 accumulator IS the int32 accumulator)."""
    import jax.numpy as jnp

    from tachikoma_tpu.ir.graph import Node
    from tachikoma_tpu.ir.registry import get_op
    from tachikoma_tpu.ops.fixed_point import requantize_np
    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize

    n, h, w, cin, cout, k = 2, 192, 192, 3, 8, 7
    x = rng.integers(-127, 127, (n, h, w, cin)).astype(np.int8)
    wt = rng.integers(-127, 127, (k, k, cin, cout)).astype(np.int8)
    bias = rng.integers(-500, 500, (cout,)).astype(np.int32)
    m, s = plan_requantize(0.0004, 0.05)

    got = np.asarray(qconv2d_flat(
        jnp.asarray(x), wt, bias=bias, multiplier=m, shift=s,
        strides=(2, 2), padding=(3, 3, 3, 3), input_zero_point=3))

    # independent oracle: qnn.conv2d np impl + exact fixed-point requantize
    node = Node("c", "qnn.conv2d", ("x", "w"),
                {"strides": (2, 2), "padding": (3, 3, 3, 3),
                 "input_zero_point": 3, "kernel_zero_point": 0,
                 "out_dtype": "int32", "data_layout": "NHWC",
                 "kernel_layout": "HWIO"})
    acc = get_op("qnn.conv2d").np_impl(x, wt, node=node) + bias
    from tachikoma_tpu.ops.fixed_point import q_multiply_shift_np

    want = np.clip(q_multiply_shift_np(acc, int(m), int(s), "UPWARD"),
                   -128, 127).astype(np.int8)
    np.testing.assert_array_equal(got, want)


def test_stem_f32_route_exact_saturated(rng):
    """Worst-case accumulation on the f32 stem route: x and w saturated to
    -128/+127 so partial sums reach the kh*kw*cin*128^2 bound.  The gate
    requires kh*kw*cin <= 1024 = 2^24/128^2 (int8 reaches -128; izp is in
    the bias, the conv sees raw x), so the f32 accumulator stays exact even
    at full saturation."""
    import jax.numpy as jnp

    from tachikoma_tpu.ir.graph import Node
    from tachikoma_tpu.ir.registry import get_op
    from tachikoma_tpu.ops.fixed_point import q_multiply_shift_np
    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize

    # gate: sh*sw*cin = 20 < 64; kh*kw*cin = 7*7*20 = 980 <= 1024 (near the
    # bound); n*h*w = 73728 >= 65536 -> takes the f32 route
    n, h, w, cin, cout, k = 2, 192, 192, 20, 8, 7
    x = np.where(rng.random((n, h, w, cin)) < 0.5, -128, 127).astype(np.int8)
    wt = np.where(rng.random((k, k, cin, cout)) < 0.5, -128, 127).astype(np.int8)
    bias = rng.integers(-500, 500, (cout,)).astype(np.int32)
    m, s = plan_requantize(0.000004, 0.05)

    got = np.asarray(qconv2d_flat(
        jnp.asarray(x), wt, bias=bias, multiplier=m, shift=s,
        strides=(1, 1), padding=(3, 3, 3, 3), input_zero_point=-128))

    node = Node("c", "qnn.conv2d", ("x", "w"),
                {"strides": (1, 1), "padding": (3, 3, 3, 3),
                 "input_zero_point": -128, "kernel_zero_point": 0,
                 "out_dtype": "int32", "data_layout": "NHWC",
                 "kernel_layout": "HWIO"})
    acc = get_op("qnn.conv2d").np_impl(x, wt, node=node) + bias
    want = np.clip(q_multiply_shift_np(acc, int(m), int(s), "UPWARD"),
                   -128, 127).astype(np.int8)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("route", ["f32", "im2col"])
def test_stem_routes_exact_per_channel(rng, route, monkeypatch):
    """Both stem routes (conv-emitter f32 and s2d+im2col+Pallas-matmul,
    TK_STEM_ROUTE) are bit-exact vs the oracle on the ResNet stem regime,
    including nonzero input zp, PER-CHANNEL requantize, and out_zp."""
    import jax.numpy as jnp

    from tachikoma_tpu.ir.graph import Node
    from tachikoma_tpu.ir.registry import get_op
    from tachikoma_tpu.ops.fixed_point import q_multiply_shift_per_axis_np
    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize

    monkeypatch.setenv("TK_STEM_ROUTE", route)
    n, h, w, cin, cout, k = 2, 192, 192, 3, 8, 7
    x = rng.integers(-128, 128, (n, h, w, cin)).astype(np.int8)
    wt = rng.integers(-127, 128, (k, k, cin, cout)).astype(np.int8)
    bias = rng.integers(-500, 500, (cout,)).astype(np.int32)
    ms = [plan_requantize(0.0004 * (1 + 0.1 * i), 0.05)
          for i in range(cout)]
    m = np.asarray([int(a) for a, _ in ms], np.int32)
    s = np.asarray([int(b) for _, b in ms], np.int32)

    got = np.asarray(qconv2d_flat(
        jnp.asarray(x), wt, bias=bias, multiplier=m, shift=s,
        strides=(2, 2), padding=(3, 3, 3, 3), input_zero_point=3,
        out_zp=4))

    node = Node("c", "qnn.conv2d", ("x", "w"),
                {"strides": (2, 2), "padding": (3, 3, 3, 3),
                 "input_zero_point": 3, "kernel_zero_point": 0,
                 "out_dtype": "int32", "data_layout": "NHWC",
                 "kernel_layout": "HWIO"})
    acc = get_op("qnn.conv2d").np_impl(x, wt, node=node) + bias
    want = np.clip(q_multiply_shift_per_axis_np(
        acc, m.astype(np.int64), s.astype(np.int64), axis=-1,
        rounding="UPWARD") + 4, -128, 127).astype(np.int8)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ratio,zp", [
    (0.04, 3),      # shift ~ -4: clamp16 tier (2-multiply fold)
    (0.004, -5),    # shift ~ -7: clamp11 tier (3-multiply fold)
    (0.3, 0),       # shift ~ -1: outside the clamp window -> select tree
    (0.00015, 2),   # shift ~ -12: outside -> select tree
])
def test_flat_conv_requantize_tiers(rng, ratio, zp):
    """Every requantize tier (clamp16 / clamp11 / mulhi fallback) through
    the ACTUAL conv kernel path, == vs the int64 oracle."""
    from tachikoma_tpu.ops.pallas.qms32 import plan_rq_clamp, plan_requantize

    m, s = plan_requantize(ratio * 0.05, 0.05)
    mode, _ = plan_rq_clamp(np.asarray([m]), np.asarray([s]), zp, -128, 127,
                            "UPWARD")
    # sanity: the parametrization hits the intended tier
    expected = {0.04: "clamp16", 0.004: "clamp11",
                0.3: None, 0.00015: None}[ratio]
    assert mode == expected, (mode, s)

    x = rng.integers(-127, 127, (2, 10, 10, 32)).astype(np.int8)
    w = rng.integers(-127, 127, (3, 3, 32, 32)).astype(np.int8)
    got = np.asarray(qconv2d_flat(x, w, multiplier=int(m), shift=int(s),
                                  strides=(1, 1), padding=(1, 1, 1, 1),
                                  out_zp=zp))
    want = oracle(x, w, np.zeros(32, np.int32), ratio * 0.05, 0.05, zp,
                  (1, 1), (1, 1, 1, 1), 1, 0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("route", ["pallas", "xla", ""])
def test_conv_routes_bitexact(rng, route, monkeypatch):
    """Round 5: depthwise defaults to the XLA-native int8 route (3-5x the
    VPU path on-chip) — BOTH routes must stay bit-exact vs the oracle, and
    the opt-in TK_CONV_ROUTE knob must select them (''=auto, 'pallas'
    forces the VPU tap path, 'xla' forces XLA even for stride-1 dense)."""
    monkeypatch.setenv("TK_CONV_ROUTE", route)
    for shape, k, strides, padding, groups in (
            ((2, 10, 10, 24), 3, (1, 1), (1, 1, 1, 1), 24),   # dw s1
            ((1, 11, 11, 16), 3, (2, 2), (1, 1, 1, 1), 16),   # dw s2
            ((1, 9, 9, 8), 3, (2, 2), (1, 1, 1, 1), 1)):      # dense s2
        n, h, wd, cin = shape
        cout = cin if groups > 1 else 12
        x = rng.integers(-127, 127, shape).astype(np.int8)
        w = rng.integers(-127, 127,
                         (k, k, cin // groups, cout)).astype(np.int8)
        bias = rng.integers(-400, 400, (cout,)).astype(np.int32)
        scales = np.full((cout,), 3e-4, np.float64)
        m_arr, s_arr = plan_requantize(scales, 0.07)
        got = np.asarray(qconv2d_flat(
            x, w, bias=bias, multiplier=m_arr, shift=s_arr,
            strides=strides, padding=padding, groups=groups, out_zp=2,
            input_zero_point=3))
        want = oracle(x, w, bias, scales, 0.07, 2, strides, padding,
                      groups, 3)
        assert (got == want).all(), (route, shape, groups)
