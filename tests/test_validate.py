"""Validator + overflow audit + viz tests."""

import numpy as np
import pytest

from tachikoma_tpu import Graph, GraphBuilder, infer_types
from tachikoma_tpu.ir.graph import Node
from tachikoma_tpu.ir.viz import render_text, to_dot
from tachikoma_tpu.models.vision import lenet5
from tachikoma_tpu.quantize.quantizer import quantize
from tachikoma_tpu.runtime.validate import audit_int32_overflow, validate_graph


def test_validate_good_graph(rng):
    g = lenet5(batch_size=1)
    data = [rng.standard_normal((1, 28, 28, 1)).astype(np.float32)]
    qg = quantize(g, data)
    rep = validate_graph(qg)
    assert rep.ok, rep.errors


def test_validate_catches_unregistered_op():
    nodes = [
        Node("x", "var", shape=(2,), dtype="float32"),
        Node("y", "my.unknown.op", ("x",)),
    ]
    g = Graph(nodes, ["y"])
    rep = validate_graph(g)
    assert not rep.ok
    assert any("my.unknown.op" in e for e in rep.errors)


def test_overflow_audit_clean(rng):
    b = GraphBuilder()
    x = b.var("x", (2, 16), "int8")
    w = b.const(rng.integers(-10, 10, (16, 8)).astype(np.int8))
    d = b.call("qnn.dense", x, w, input_zero_point=0, kernel_zero_point=0, out_dtype="int32")
    g = infer_types(b.build(d))
    data = rng.integers(-10, 10, (2, 16)).astype(np.int8)
    assert audit_int32_overflow(g, data) == []


def test_overflow_audit_flags(rng):
    # K large enough that worst-case int8 products exceed int32:
    # 127*127*K > 2^31 for K > 133k; construct with int32-typed inputs instead
    b = GraphBuilder()
    x = b.var("x", (1, 64), "int32")
    w = b.const(np.full((64, 4), 2**20, dtype=np.int32))
    d = b.call("qnn.dense", x, w, input_zero_point=0, kernel_zero_point=0, out_dtype="int32")
    g = infer_types(b.build(d))
    data = np.full((1, 64), 2**12, dtype=np.int32)
    findings = audit_int32_overflow(g, data)
    assert findings and findings[0].op == "qnn.dense"
    assert findings[0].headroom_bits < 0


def test_viz_outputs(rng):
    g = lenet5(batch_size=1)
    dot = to_dot(g)
    assert dot.startswith("digraph") and '"conv1"' in dot and "->" in dot
    txt = render_text(g)
    assert "lenet5" in txt and "nn.conv2d" in txt


def test_overflow_audit_accepts_w8a16(rng):
    """int64 accumulators (the W8A16 design) must not be reported as
    int32 overflows."""
    from tachikoma_tpu import GraphBuilder, infer_types
    from tachikoma_tpu.runtime.validate import audit_int32_overflow

    b = GraphBuilder()
    x = b.var("x", (2, 64), "int16")
    w = b.const(rng.integers(-127, 127, (64, 32)).astype(np.int8), "w")
    acc = b.call("qnn.dense", x, w, out_dtype="int64")
    g = infer_types(b.build(acc))
    xin = rng.integers(-30000, 30000, (2, 64)).astype(np.int16)
    assert audit_int32_overflow(g, xin) == []
