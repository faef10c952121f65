"""FQ2I (prequantized QDQ import) — the model's scales drive the integer
graph; exact weight recovery; parity with the QDQ float simulation."""

import numpy as np

from tachikoma_tpu import run_graph
from tachikoma_tpu.frontend.onnx import from_onnx
from tachikoma_tpu.quantize.fq2i import fq2i

from test_frontend_onnx import make_model, node


def _qdq_conv_model(rng):
    """x -> Q -> DQ -> Conv(wDQ) -> Relu -> Q -> DQ -> out (classic QDQ)."""
    wq = rng.integers(-127, 127, (8, 4, 3, 3)).astype(np.int8)   # OIHW
    wscale = (0.01 + rng.random(8) * 0.02).astype(np.float32)    # per-channel
    bias_f = (rng.standard_normal(8) * 0.5).astype(np.float32)
    nodes = [
        node("QuantizeLinear", ["x", "xs", "xzp"], ["xq"]),
        node("DequantizeLinear", ["xq", "xs", "xzp"], ["xdq"]),
        node("DequantizeLinear", ["w_q", "ws", "wzp"], ["wdq"], axis=0),
        node("Conv", ["xdq", "wdq", "bias"], ["c"],
             pads=[1, 1, 1, 1], strides=[1, 1]),
        node("Relu", ["c"], ["r"]),
        node("QuantizeLinear", ["r", "ys", "yzp"], ["yq"]),
        node("DequantizeLinear", ["yq", "ys", "yzp"], ["y"]),
    ]
    inits = {
        "xs": np.float32(0.05), "xzp": np.int8(3),
        "ws": wscale, "wzp": np.zeros(8, np.int8),
        "ys": np.float32(0.04), "yzp": np.int8(-8),
        "w_q": wq, "bias": bias_f,
    }
    return make_model(nodes, {"x": (1, 4, 8, 8)}, {"y": (1, 8, 8, 8)}, inits), wq


def test_fq2i_conv_uses_model_scales(rng):
    model, wq = _qdq_conv_model(rng)
    g = from_onnx(model)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    ref = run_graph(g, [x])[0]          # QDQ float simulation
    ig = fq2i(g)
    ops = {n.op for n in ig.nodes}
    assert "qnn.conv2d" in ops
    # interior is integer: no float conv remains
    assert "nn.conv2d" not in ops
    # exact int8 weight recovery (transposed to HWIO)
    qw = [p for name, p in ig.params.items() if name.endswith("_qw")]
    assert qw and np.array_equal(
        np.transpose(wq, (2, 3, 1, 0)).astype(np.int8), qw[0])
    got = run_graph(ig, [x])[0]
    # integer path matches the QDQ float simulation within 1 output LSB
    assert np.abs(got - ref).max() <= 0.04 + 1e-6


def test_fq2i_qlinearconv(rng):
    wq = rng.integers(-100, 100, (6, 3, 3, 3)).astype(np.int8)
    bq = rng.integers(-500, 500, 6).astype(np.int32)
    nodes = [
        node("QuantizeLinear", ["x", "xs", "xzp"], ["xq"]),
        node("QLinearConv",
             ["xq", "xs", "xzp", "w_q", "ws", "wzp", "ys", "yzp", "bias"],
             ["yq"], pads=[1, 1, 1, 1], strides=[1, 1]),
        node("DequantizeLinear", ["yq", "ys", "yzp"], ["y"]),
    ]
    inits = {
        "xs": np.float32(0.03), "xzp": np.int8(0),
        "ws": np.float32(0.015), "wzp": np.int8(0),
        "ys": np.float32(0.1), "yzp": np.int8(5),
        "w_q": wq, "bias": bq,
    }
    model = make_model(nodes, {"x": (1, 3, 10, 10)}, {"y": (1, 6, 10, 10)}, inits)
    g = from_onnx(model)
    x = rng.standard_normal((1, 3, 10, 10)).astype(np.float32)
    ref = run_graph(g, [x])[0]
    ig = fq2i(g)
    assert "qnn.conv2d" in {n.op for n in ig.nodes}
    got = run_graph(ig, [x])[0]
    assert np.abs(got - ref).max() <= 0.1 + 1e-6


def test_fq2i_qlinearmatmul(rng):
    aq_w = rng.integers(-127, 127, (16, 12)).astype(np.int8)
    nodes = [
        node("QuantizeLinear", ["x", "xs", "xzp"], ["xq"]),
        node("QLinearMatMul",
             ["xq", "xs", "xzp", "w_q", "ws", "wzp", "ys", "yzp"], ["yq"]),
        node("DequantizeLinear", ["yq", "ys", "yzp"], ["y"]),
    ]
    inits = {
        "xs": np.float32(0.05), "xzp": np.int8(2),
        "ws": np.float32(0.02), "wzp": np.int8(0),
        "ys": np.float32(0.2), "yzp": np.int8(0),
        "w_q": aq_w,
    }
    model = make_model(nodes, {"x": (4, 16)}, {"y": (4, 12)}, inits)
    g = from_onnx(model)
    x = rng.standard_normal((4, 16)).astype(np.float32)
    ref = run_graph(g, [x])[0]
    ig = fq2i(g)
    assert "qnn.dense" in {n.op for n in ig.nodes}
    got = run_graph(ig, [x])[0]
    assert np.abs(got - ref).max() <= 0.2 + 1e-6
