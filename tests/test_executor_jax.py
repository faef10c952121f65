"""JAX executor vs numpy oracle: bitwise equality on integer graphs,
allclose on float graphs — the dual-run strategy replacing the reference's
ctypes/cython dual CI runs (SURVEY.md §4)."""

import numpy as np
import pytest

from tachikoma_tpu import GraphBuilder, infer_types, run_graph
from tachikoma_tpu.runtime.executor import JaxExecutor, computational_nodes


def both(g, inputs):
    oracle = run_graph(g, inputs)
    jx = JaxExecutor(g).run(inputs)
    return oracle, jx


def test_float_graph_close(rng):
    b = GraphBuilder()
    x = b.var("x", (2, 8, 8, 3), "float32")
    w = b.const(rng.standard_normal((3, 3, 3, 16), dtype=np.float32) * 0.1, "w")
    c = b.call("nn.conv2d", x, w, padding=(1, 1, 1, 1))
    bn_g = b.const(np.abs(rng.standard_normal(16)).astype(np.float32) + 0.5)
    bn_b = b.const(rng.standard_normal(16).astype(np.float32))
    bn_m = b.const(rng.standard_normal(16).astype(np.float32))
    bn_v = b.const(np.abs(rng.standard_normal(16)).astype(np.float32) + 0.5)
    n = b.call("nn.batch_norm", c, bn_g, bn_b, bn_m, bn_v)
    r = b.call("nn.relu", n)
    p = b.call("nn.max_pool2d", r, pool_size=(2, 2), strides=(2, 2))
    f = b.call("nn.batch_flatten", p)
    w2 = b.const(rng.standard_normal((16 * 16, 10), dtype=np.float32) * 0.1)
    d = b.call("nn.dense", f, w2)
    s = b.call("nn.softmax", d)
    g = infer_types(b.build(s))
    data = rng.standard_normal((2, 8, 8, 3), dtype=np.float32)
    oracle, jx = both(g, data)
    np.testing.assert_allclose(oracle[0], jx[0], rtol=1e-4, atol=1e-5)


def int8_conv_graph(rng, groups=1, izp=3, kzp=0):
    b = GraphBuilder()
    cin, cout = 8, 16
    x = b.var("x", (2, 9, 9, cin), "int8")
    w = b.const(
        rng.integers(-127, 127, (3, 3, cin // groups, cout), dtype=np.int64).astype(np.int8), "w"
    )
    c = b.call(
        "qnn.conv2d", x, w,
        input_zero_point=izp, kernel_zero_point=kzp,
        padding=(1, 1, 1, 1), strides=(2, 2), groups=groups, out_dtype="int32",
    )
    bias = b.const(rng.integers(-1000, 1000, cout, dtype=np.int64).astype(np.int32), "bias")
    ba = b.call("nn.bias_add", c, bias)
    rq = b.call(
        "qnn.requantize", ba,
        input_scale=0.0003, input_zero_point=0,
        output_scale=0.05, output_zero_point=-4, out_dtype="int8",
    )
    return infer_types(b.build(rq))


@pytest.mark.parametrize("groups,izp,kzp", [(1, 3, 0), (1, 0, 5), (8, -7, 0), (4, 2, 1)])
def test_qnn_conv_bitexact(rng, groups, izp, kzp):
    g = int8_conv_graph(rng, groups=groups, izp=izp, kzp=kzp)
    data = rng.integers(-128, 128, (2, 9, 9, 8), dtype=np.int64).astype(np.int8)
    oracle, jx = both(g, data)
    np.testing.assert_array_equal(oracle[0], jx[0])
    assert jx[0].dtype == np.int8


def test_qnn_dense_chain_bitexact(rng):
    b = GraphBuilder()
    x = b.var("x", (4, 64), "int8")
    w = b.const(rng.integers(-127, 127, (64, 32), dtype=np.int64).astype(np.int8))
    mm = b.call("qnn.dense", x, w, input_zero_point=-3, kernel_zero_point=0, out_dtype="int32")
    rq = b.call(
        "qnn.requantize", mm,
        input_scale=0.001, input_zero_point=0,
        output_scale=0.02, output_zero_point=6, out_dtype="int8",
        rounding="TONEAREST",
    )
    g = infer_types(b.build(rq))
    data = rng.integers(-128, 128, (4, 64), dtype=np.int64).astype(np.int8)
    oracle, jx = both(g, data)
    np.testing.assert_array_equal(oracle[0], jx[0])


def test_qnn_elementwise_bitexact(rng):
    b = GraphBuilder()
    x = b.var("x", (32,), "int8")
    y = b.var("y", (32,), "int8")
    s = b.call(
        "qnn.add", x, y,
        lhs_scale=0.3, lhs_zero_point=4, rhs_scale=0.2, rhs_zero_point=-3,
        output_scale=0.25, output_zero_point=5, out_dtype="int8",
    )
    m = b.call(
        "qnn.mul", s, y,
        lhs_scale=0.25, lhs_zero_point=5, rhs_scale=0.2, rhs_zero_point=-3,
        output_scale=0.1, output_zero_point=0, out_dtype="int8",
    )
    g = infer_types(b.build(m))
    a = rng.integers(-100, 100, (32,), dtype=np.int64).astype(np.int8)
    c = rng.integers(-100, 100, (32,), dtype=np.int64).astype(np.int8)
    oracle, jx = both(g, {"x": a, "y": c})
    np.testing.assert_array_equal(oracle[0], jx[0])


def test_per_channel_requantize_bitexact(rng):
    b = GraphBuilder()
    x = b.var("x", (2, 3, 8), "int32")
    scales = [float(s) for s in (0.001 + np.abs(rng.standard_normal(8)) * 0.01)]
    rq = b.call(
        "qnn.requantize", x,
        input_scale=scales, input_zero_point=0,
        output_scale=0.05, output_zero_point=0, axis=2, out_dtype="int8",
    )
    g = infer_types(b.build(rq))
    data = rng.integers(-(2**16), 2**16, (2, 3, 8), dtype=np.int64).astype(np.int32)
    oracle, jx = both(g, data)
    np.testing.assert_array_equal(oracle[0], jx[0])


def test_int_pooling_bitexact(rng):
    b = GraphBuilder()
    x = b.var("x", (1, 8, 8, 4), "int8")
    mp = b.call("nn.max_pool2d", x, pool_size=(3, 3), strides=(2, 2), padding=(1, 1, 1, 1))
    g1 = infer_types(b.build(mp))
    b2 = GraphBuilder()
    x2 = b2.var("x", (1, 8, 8, 4), "int8")
    ap = b2.call(
        "qnn.avg_pool2d", x2, pool_size=(2, 2), strides=(2, 2), padding=(0, 0, 0, 0),
        input_scale=0.1, input_zero_point=3, output_scale=0.2, output_zero_point=-1,
        out_dtype="int8",
    )
    g2 = infer_types(b2.build(ap))
    data = rng.integers(-128, 128, (1, 8, 8, 4), dtype=np.int64).astype(np.int8)
    for g in (g1, g2):
        oracle, jx = both(g, data)
        np.testing.assert_array_equal(oracle[0], jx[0])


def test_global_avg_pool_int_bitexact(rng):
    b = GraphBuilder()
    x = b.var("x", (2, 7, 7, 8), "int8")
    p = b.call("nn.global_avg_pool2d", x)
    g = infer_types(b.build(p))
    data = rng.integers(-128, 128, (2, 7, 7, 8), dtype=np.int64).astype(np.int8)
    oracle, jx = both(g, data)
    np.testing.assert_array_equal(oracle[0], jx[0])


def test_capture_intermediates(rng):
    g = int8_conv_graph(rng)
    names = computational_nodes(g)
    data = rng.integers(-128, 128, (2, 9, 9, 8), dtype=np.int64).astype(np.int8)
    ex = JaxExecutor(g, capture=names)
    outs = ex.run(data)
    assert len(outs) == len(names)
    # capture set must match oracle per-op outputs bitwise
    recorded = {}
    run_graph(g, data, intercept=lambda name, op, ins, out: recorded.__setitem__(name, out))
    for name, got in zip(names, outs):
        np.testing.assert_array_equal(recorded[name], got, err_msg=name)


def test_executor_input_validation(rng):
    g = int8_conv_graph(rng)
    ex = JaxExecutor(g)
    with pytest.raises(KeyError, match="graph inputs not provided"):
        ex.run({"bogus": np.zeros((2, 9, 9, 8), np.int8)})


def test_conv2d_transpose_bitexact(rng):
    b = GraphBuilder()
    x = b.var("x", (1, 5, 5, 4), "int8")
    w = b.const(rng.integers(-100, 100, (3, 3, 4, 6), dtype=np.int64).astype(np.int8))
    c = b.call(
        "qnn.conv2d_transpose", x, w,
        input_zero_point=2, kernel_zero_point=-1,
        strides=(2, 2), padding=(1, 1, 1, 1), out_dtype="int32",
    )
    g = infer_types(b.build(c))
    data = rng.integers(-128, 128, (1, 5, 5, 4), dtype=np.int64).astype(np.int8)
    oracle, jx = both(g, data)
    np.testing.assert_array_equal(oracle[0], jx[0])
