"""W8A16 (16-bit activations, 8-bit weights — the TFLite 16x8 mode).

int64 accumulators requantize through the wide fixed-point path; the
exactness contract (oracle == XLA, `==`) holds, and accuracy beats int8.
"""

import numpy as np
import pytest

from tachikoma_tpu import GraphBuilder, infer_types, run_graph
from tachikoma_tpu.quantize.config import W8A16, QConfig
from tachikoma_tpu.quantize.quantizer import quantize
from tachikoma_tpu.runtime.executor import run_graph_jax


def _cnn(rng):
    b = GraphBuilder()
    x = b.var("x", (2, 12, 12, 8), "float32")

    def conv(src, cin, cout, name, stride=1):
        w = b.const(rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
                    * 0.25, name + "_w")
        bias = b.const(rng.standard_normal(cout).astype(np.float32) * 0.1,
                       name + "_b")
        c = b.call("nn.conv2d", src, w, padding=(1, 1, 1, 1),
                   strides=(stride, stride), name=name)
        c = b.call("nn.bias_add", c, bias)
        return b.call("nn.relu", c)

    h = conv(conv(x, 8, 16, "c1"), 16, 16, "c2", stride=2)
    h = b.call("nn.max_pool2d", h, pool_size=(2, 2), strides=(2, 2))
    h = b.call("reshape", h, newshape=(2, 3 * 3 * 16))
    wfc = b.const(rng.standard_normal((3 * 3 * 16, 10)).astype(np.float32)
                  * 0.2, "fc_w")
    return infer_types(b.build(b.call("nn.dense", h, wfc, name="fc")))


def test_w8a16_bit_exact_and_more_accurate(rng):
    g = _cnn(rng)
    calib = [rng.standard_normal((2, 12, 12, 8)).astype(np.float32)
             for _ in range(3)]
    q16 = quantize(g, calib, config=W8A16)
    # int16 tensors and int64 accumulators actually appear
    dts = {n.dtype for n in q16.nodes}
    assert "int16" in dts and "int64" in dts, dts
    x = calib[0]
    o = run_graph(q16, x)
    j = run_graph_jax(q16, x)
    for a, c in zip(o, j):
        a, c = np.asarray(a), np.asarray(c)
        if a.dtype.kind in "iu":
            assert (a == c).all(), "W8A16 oracle vs XLA mismatch"
        else:
            assert (a == c).all(), "dequant of identical ints must be =="

    # accuracy: W8A16 is strictly closer to float than int8 (activation
    # error shrinks ~256x; weights stay int8 in both, so the remaining
    # error floor is the shared weight quantization)
    ref = np.asarray(run_graph(g, x)[0], np.float64)
    e16 = np.abs(np.asarray(o[0], np.float64) - ref).mean()
    q8 = quantize(g, calib, config=QConfig())
    e8 = np.abs(np.asarray(run_graph(q8, x)[0], np.float64) - ref).mean()
    assert e16 < e8 * 0.75, f"int16 err {e16} not < int8 err {e8}"


def test_w8a16_traces_byte_identical(rng):
    from tachikoma_tpu.trace.emitter import emit_trace, verify_trace

    g = _cnn(rng)
    calib = [rng.standard_normal((2, 12, 12, 8)).astype(np.float32)]
    q16 = quantize(g, calib, config=W8A16)
    x = calib[0]
    blob_np = emit_trace(q16, x, backend="numpy")
    blob_jx = emit_trace(q16, x, backend="jax")
    assert blob_np == blob_jx
    assert verify_trace(blob_np, q16)["mismatches"] == []


def test_wide_fixed_point_vs_bignum(rng):
    """q_multiply_shift_wide == Python arbitrary-precision arithmetic."""
    from tachikoma_tpu.ops.fixed_point import (TONEAREST, UPWARD,
                                               q_multiply_shift_wide_np)

    def ref(x, m, shift, rounding):
        left, right = max(shift, 0), max(-shift, 0)
        t = right + 31
        p = (int(x) << left) * m
        R = (1 << (t - 1)) - (1 if rounding == TONEAREST and p < 0 else 0)
        return (p + R) >> t

    xs = np.concatenate([
        rng.integers(-2**45, 2**45, 500),
        np.array([0, 1, -1, 2**40, -2**40])]).astype(np.int64)
    for m in (1073741824, 1518500250, 2147483647):
        for shift in (0, -3, -17, -31, 1):
            for rounding in (UPWARD, TONEAREST):
                got = q_multiply_shift_wide_np(xs, m, shift, rounding)
                want = np.array([ref(int(v), m, shift, rounding)
                                 for v in xs], np.int64)
                assert (got == want).all(), (m, shift, rounding)
