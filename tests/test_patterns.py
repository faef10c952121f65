"""Dataflow pattern language tests."""

import numpy as np
import pytest

from tachikoma_tpu import GraphBuilder, infer_types, run_graph
from tachikoma_tpu.ir.patterns import (
    find_matches,
    is_const,
    is_op,
    is_var,
    partition,
    rewrite,
    wildcard,
)


def _graph():
    b = GraphBuilder()
    x = b.var("x", (2, 4), "float32")
    w = b.const(np.eye(4, dtype=np.float32), "w")
    d = b.call("nn.dense", x, w)
    r = b.call("nn.relu", d)
    q = b.call("qnn.quantize", r, scale=0.1, zero_point=0, out_dtype="int8")
    dq = b.call("qnn.dequantize", q, scale=0.1, zero_point=0)
    return infer_types(b.build(dq))


def test_find_matches_basic():
    g = _graph()
    assert len(find_matches(g, is_op("nn.relu", wildcard()))) == 1
    assert len(find_matches(g, is_op("nn.dense", is_var(), is_const()))) == 1
    assert len(find_matches(g, is_op("nn.dense", is_const(), is_const()))) == 0
    dq_of_q = is_op("qnn.dequantize", is_op("qnn.quantize", wildcard()))
    assert len(find_matches(g, dq_of_q)) == 1


def test_attr_and_bind():
    g = _graph()
    pat = is_op("qnn.quantize", wildcard().bind("src")).with_attrs(out_dtype="int8")
    ms = find_matches(g, pat)
    assert len(ms) == 1 and ms[0].binds["src"] == "nn_relu"
    pat2 = is_op("qnn.quantize", wildcard()).with_attrs(out_dtype="uint8")
    assert not find_matches(g, pat2)


def test_alternation():
    g = _graph()
    pat = is_op("nn.relu", wildcard()) | is_op("nn.dense", wildcard(), wildcard())
    assert len(find_matches(g, pat)) == 2


def test_rewrite_cancels_quant_roundtrip():
    g = _graph()
    # dequantize(quantize(x)) with matching scales -> x (approximately);
    # rewrite replaces the pair with the float source
    pat = is_op("qnn.dequantize", is_op("qnn.quantize", wildcard().bind("src")))

    def cb(b, old_g, match, mapping):
        return mapping[match.binds["src"]]

    g2 = rewrite(g, pat, cb)
    ops = [n.op for n in g2.nodes]
    assert "qnn.dequantize" not in ops and "qnn.quantize" not in ops
    x = np.random.default_rng(0).standard_normal((2, 4)).astype(np.float32)
    got = run_graph(infer_types(g2), x)[0]
    want = np.maximum(x @ np.eye(4, dtype=np.float32), 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_partition_labels_composite():
    g = _graph()
    pat = is_op("nn.dense", wildcard(), is_const())
    g2 = partition(g, pat, "tk.byoc_dense")
    labeled = [n for n in g2.nodes if n.attrs.get("composite") == "tk.byoc_dense"]
    assert len(labeled) == 1 and labeled[0].op == "nn.dense"
