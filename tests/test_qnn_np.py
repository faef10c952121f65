"""QNN dialect oracle tests — exact integer semantics (SURVEY.md §8.2).

Golden comparisons are *exact* (==), not allclose: integer semantics make
equality meaningful, per the build plan (SURVEY.md §4 implication (b))."""

import numpy as np
import pytest

from tachikoma_tpu import GraphBuilder, infer_types, run_graph
from tachikoma_tpu.ops.fixed_point import requantize_np


def run_op(op, arrays, **attrs):
    b = GraphBuilder()
    names = [b.var(f"in{i}", a.shape, str(a.dtype)) for i, a in enumerate(arrays)]
    out = b.call(op, *names, **attrs)
    g = infer_types(b.build(out))
    return run_graph(g, {f"in{i}": a for i, a in enumerate(arrays)})[0]


def test_quantize_round_ties_to_even():
    x = np.array([0.5, 1.5, 2.5, -0.5, -1.5], dtype=np.float32)
    got = run_op("qnn.quantize", [x], scale=1.0, zero_point=0, out_dtype="int8")
    # nearbyint ties-to-even: 0.5->0, 1.5->2, 2.5->2, -0.5->0, -1.5->-2
    np.testing.assert_array_equal(got, [0, 2, 2, 0, -2])


def test_quantize_clip_and_zp():
    x = np.array([-100.0, 0.0, 100.0], dtype=np.float32)
    got = run_op("qnn.quantize", [x], scale=0.5, zero_point=10, out_dtype="int8")
    np.testing.assert_array_equal(got, [-128, 10, 127])
    got = run_op("qnn.quantize", [x], scale=0.5, zero_point=10, out_dtype="uint8")
    np.testing.assert_array_equal(got, [0, 10, 210])


def test_dequantize_inverse(rng):
    q = rng.integers(-128, 128, size=(3, 4), dtype=np.int64).astype(np.int8)
    got = run_op("qnn.dequantize", [q], scale=0.25, zero_point=-3)
    np.testing.assert_allclose(got, (q.astype(np.int32) + 3) * 0.25)


def test_quantize_per_channel(rng):
    x = rng.standard_normal((2, 3, 4), dtype=np.float32)
    scales = [0.1, 0.2, 0.05, 0.4]
    got = run_op("qnn.quantize", [x], scale=scales, zero_point=0, axis=2, out_dtype="int8")
    for c, s in enumerate(scales):
        want = run_op("qnn.quantize", [x[..., c]], scale=s, zero_point=0, out_dtype="int8")
        np.testing.assert_array_equal(got[..., c], want)


def test_qnn_conv2d_zero_points(rng):
    data = rng.integers(0, 255, (1, 5, 5, 3), dtype=np.int64).astype(np.uint8)
    weight = rng.integers(-127, 127, (3, 3, 3, 4), dtype=np.int64).astype(np.int8)
    got = run_op(
        "qnn.conv2d", [data, weight],
        input_zero_point=128, kernel_zero_point=3,
        padding=(1, 1, 1, 1), out_dtype="int32",
    )
    # independent reference: float64 conv of shifted values
    d = data.astype(np.float64) - 128
    w = weight.astype(np.float64) - 3
    from tests.test_ops_np import ref_conv2d

    want = ref_conv2d(d, w, (1, 1), (1, 1, 1, 1), (1, 1), 1)
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_qnn_dense(rng):
    d = rng.integers(-128, 127, (4, 16), dtype=np.int64).astype(np.int8)
    w = rng.integers(-128, 127, (16, 8), dtype=np.int64).astype(np.int8)
    got = run_op("qnn.dense", [d, w], input_zero_point=-5, kernel_zero_point=2, out_dtype="int32")
    want = (d.astype(np.int64) + 5) @ (w.astype(np.int64) - 2)
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_qnn_batch_matmul(rng):
    a = rng.integers(-128, 127, (2, 3, 5), dtype=np.int64).astype(np.int8)
    b = rng.integers(-128, 127, (2, 5, 4), dtype=np.int64).astype(np.int8)
    got = run_op("qnn.batch_matmul", [a, b], lhs_zero_point=1, rhs_zero_point=-2, out_dtype="int32")
    want = (a.astype(np.int64) - 1) @ (b.astype(np.int64) + 2)
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_qnn_add_same_params_is_plain_add():
    a = np.array([10, 20, 100], dtype=np.int8)
    b = np.array([5, -10, 100], dtype=np.int8)
    got = run_op(
        "qnn.add", [a, b],
        lhs_scale=0.1, lhs_zero_point=0,
        rhs_scale=0.1, rhs_zero_point=0,
        output_scale=0.1, output_zero_point=0, out_dtype="int8",
    )
    want = np.clip(a.astype(np.int32) + b.astype(np.int32), -128, 127).astype(np.int8)
    np.testing.assert_array_equal(got, want)


def test_qnn_add_requantizes_inputs(rng):
    a = rng.integers(-100, 100, (32,), dtype=np.int64).astype(np.int8)
    b = rng.integers(-100, 100, (32,), dtype=np.int64).astype(np.int8)
    la, lz, ra, rz, oa, oz = 0.3, 4, 0.2, -3, 0.25, 5
    got = run_op(
        "qnn.add", [a, b],
        lhs_scale=la, lhs_zero_point=lz,
        rhs_scale=ra, rhs_zero_point=rz,
        output_scale=oa, output_zero_point=oz, out_dtype="int8",
    )
    qa = requantize_np(a, la, lz, oa, oz, out_dtype="int32")
    qb = requantize_np(b, ra, rz, oa, oz, out_dtype="int32")
    want = np.clip(qa + qb - oz, -128, 127).astype(np.int8)
    np.testing.assert_array_equal(got, want)
    # numeric sanity vs float math
    fa = (a.astype(np.float64) - lz) * la
    fb = (b.astype(np.float64) - rz) * ra
    approx = np.rint((fa + fb) / oa) + oz
    assert np.abs(got.astype(np.float64) - np.clip(approx, -128, 127)).max() <= 2


def test_qnn_mul(rng):
    a = rng.integers(-11, 11, (32,), dtype=np.int64).astype(np.int8)
    b = rng.integers(-11, 11, (32,), dtype=np.int64).astype(np.int8)
    la, lz, ra, rz, oa, oz = 0.3, 1, 0.2, -1, 0.5, 0
    got = run_op(
        "qnn.mul", [a, b],
        lhs_scale=la, lhs_zero_point=lz,
        rhs_scale=ra, rhs_zero_point=rz,
        output_scale=oa, output_zero_point=oz, out_dtype="int8",
    )
    prod = (a.astype(np.int32) - lz) * (b.astype(np.int32) - rz)
    want = requantize_np(prod, la * ra, 0, oa, oz, out_dtype="int8")
    np.testing.assert_array_equal(got, want)


def test_qnn_requantize_graph_op(rng):
    x = rng.integers(-(2**15), 2**15, (64,), dtype=np.int64).astype(np.int32)
    got = run_op(
        "qnn.requantize", [x],
        input_scale=0.05, input_zero_point=3,
        output_scale=0.1, output_zero_point=-7, out_dtype="int8",
    )
    want = requantize_np(x, 0.05, 3, 0.1, -7, out_dtype="int8")
    np.testing.assert_array_equal(got, want)


def test_qnn_concatenate(rng):
    a = rng.integers(-100, 100, (2, 3), dtype=np.int64).astype(np.int8)
    b = rng.integers(-100, 100, (2, 5), dtype=np.int64).astype(np.int8)
    got = run_op(
        "qnn.concatenate", [a, b], axis=1,
        input_scales=(0.1, 0.2), input_zero_points=(0, 5),
        output_scale=0.1, output_zero_point=0, out_dtype="int8",
    )
    wb = requantize_np(b, 0.2, 5, 0.1, 0, out_dtype="int8")
    np.testing.assert_array_equal(got, np.concatenate([a, wb], axis=1))


def test_qnn_avg_pool2d(rng):
    x = rng.integers(-128, 127, (1, 4, 4, 2), dtype=np.int64).astype(np.int8)
    got = run_op(
        "qnn.avg_pool2d", [x],
        pool_size=(2, 2), strides=(2, 2), padding=(0, 0, 0, 0),
        input_scale=0.1, input_zero_point=4,
        output_scale=0.1, output_zero_point=4, out_dtype="int8",
    )
    v = x.astype(np.int64).reshape(1, 2, 2, 2, 2, 2).transpose(0, 1, 3, 2, 4, 5) - 4
    tot = v.sum(axis=(3, 4))
    half = 2
    avg = np.where(tot >= 0, (tot + half) // 4, -((-tot + half) // 4))
    want = np.clip(avg + 4, -128, 127).astype(np.int8)
    np.testing.assert_array_equal(got, want)


def test_qnn_leaky_relu():
    x = np.array([-100, -10, 0, 10, 100], dtype=np.int8)
    got = run_op(
        "qnn.leaky_relu", [x], alpha=0.25,
        input_scale=0.1, input_zero_point=0,
        output_scale=0.1, output_zero_point=0, out_dtype="int8",
    )
    # positive passes through; negative multiplied by 0.25 (fixed point, UPWARD)
    np.testing.assert_array_equal(got[2:], [0, 10, 100])
    assert got[0] == -25 and got[1] in (-2, -3)


def test_end_to_end_int8_dense_chain(rng):
    """quantize -> qnn.dense -> bias add -> requantize -> dequantize pipeline
    stays within 1 quantization step of float math."""
    x = rng.standard_normal((4, 32), dtype=np.float32)
    w = (rng.standard_normal((32, 16), dtype=np.float32) * 0.2)
    s_in, s_w = 0.02, 0.002
    b = GraphBuilder()
    xv = b.var("x", x.shape, "float32")
    xq = b.call("qnn.quantize", xv, scale=s_in, zero_point=0, out_dtype="int8")
    wq_np = np.clip(np.rint(w / s_w), -127, 127).astype(np.int8)
    wq = b.const(wq_np, "w")
    mm = b.call("qnn.dense", xq, wq, input_zero_point=0, kernel_zero_point=0, out_dtype="int32")
    rq = b.call(
        "qnn.requantize", mm,
        input_scale=s_in * s_w, input_zero_point=0,
        output_scale=0.05, output_zero_point=0, out_dtype="int8",
    )
    dq = b.call("qnn.dequantize", rq, scale=0.05, zero_point=0)
    g = infer_types(b.build(dq))
    got = run_graph(g, {"x": x})[0]
    want = (np.rint(x / s_in).clip(-128, 127) * s_in) @ (wq_np * s_w)
    assert np.abs(got - want).max() <= 0.05 + 1e-6


def test_qnn_lut_poly_hybrid_exhaustive(rng):
    """qnn.lut's polynomial-hybrid jax realization is bit-identical to the
    oracle for EVERY possible int8 input, across table shapes (smooth
    saturating tables take the poly path; a rough random table must fall
    back to the packed select chain)."""
    import math

    from tachikoma_tpu.ir.graph import Node
    from tachikoma_tpu.ir.registry import get_op
    from tachikoma_tpu.ops import jax_ops  # noqa: F401 (registers impls)
    from tachikoma_tpu.ops.qnn import build_lut

    def gelu(t):
        t = np.asarray(t, np.float64)
        return 0.5 * t * (1 + np.vectorize(math.erf)(t / math.sqrt(2)))

    tables = {
        "gelu": build_lut(gelu, 0.05, 0, 0.05, 0),
        "gelu_offzp": build_lut(gelu, 0.031, 7, 0.042, -3),
        "sigmoid": build_lut(lambda t: 1 / (1 + np.exp(-t)), 0.08, 0,
                             1 / 256.0, -128),
        "tanh": build_lut(np.tanh, 0.06, -2, 1 / 128.0, 0),
        "random": rng.integers(-128, 128, 256).astype(np.int8),
    }
    x = np.arange(-128, 128, dtype=np.int8).reshape(2, 128)
    for name, table in tables.items():
        node = Node("lut", "qnn.lut", ("x",),
                    {"table": [int(v) for v in table]})
        want = get_op("qnn.lut").np_impl(x, node=node)
        got = np.asarray(get_op("qnn.lut").jax_impl(x, node=node))
        np.testing.assert_array_equal(want, got, err_msg=name)


def test_qnn_softmax_div_exact_all_rows(rng):
    """The f32-reciprocal division inside qnn.softmax's jax realization is
    floor-exact: oracle == jax over many random rows including adversarial
    near-boundary sums."""
    from tachikoma_tpu.ir.graph import Node
    from tachikoma_tpu.ir.registry import get_op
    from tachikoma_tpu.ops import jax_ops  # noqa: F401 (registers impls)

    node = Node("sm", "qnn.softmax", ("x",),
                {"axis": -1, "input_scale": 0.11, "out_dtype": "int8"})
    x = rng.integers(-128, 128, (64, 37, 128), dtype=np.int64).astype(np.int8)
    want = get_op("qnn.softmax").np_impl(x, node=node)
    got = np.asarray(get_op("qnn.softmax").jax_impl(x, node=node))
    np.testing.assert_array_equal(want, got)
