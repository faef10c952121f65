"""tk.cond / tk.while_loop: data-dependent control flow as first-class ops
(the Relay VM's If/loop capability, bytecode.h:50-70, realized as
lax.cond/lax.while_loop)."""

import numpy as np
import pytest

from tachikoma_tpu import Graph, GraphBuilder, infer_types, run_graph
from tachikoma_tpu.runtime.executor import run_graph_jax


def _sub(build_fn, name="sub"):
    # Graph(...) directly (no dead_code_eliminate): while-loop cond/body
    # must keep EVERY state var even when unused (the lax carry contract)
    b = GraphBuilder(name)
    out = build_fn(b)
    outs = out if isinstance(out, list) else [out]
    g = Graph(list(b.nodes), outs, dict(b.params), name)
    return infer_types(g).to_json()


def test_cond_int8_bit_exact(rng):
    then_j = _sub(lambda b: b.call(
        "add", b.var("a", (4, 8), "int32"), b.var("c", (4, 8), "int32")))
    else_j = _sub(lambda b: b.call(
        "subtract", b.var("a", (4, 8), "int32"), b.var("c", (4, 8), "int32")))
    b = GraphBuilder()
    p = b.var("p", (), "bool")
    x = b.var("x", (4, 8), "int32")
    y = b.var("y", (4, 8), "int32")
    out = b.call("tk.cond", p, x, y, then_graph=then_j, else_graph=else_j)
    g = infer_types(b.build(out))
    assert g[out].shape == (4, 8) and g[out].dtype == "int32"
    xv = rng.integers(-100, 100, (4, 8)).astype(np.int32)
    yv = rng.integers(-100, 100, (4, 8)).astype(np.int32)
    for pred, want in [(True, xv + yv), (False, xv - yv)]:
        feeds = {"p": np.asarray(pred), "x": xv, "y": yv}
        o = run_graph(g, feeds)[0]
        j = run_graph_jax(g, feeds)[0]
        np.testing.assert_array_equal(o, want)
        assert (o == np.asarray(j)).all()


def test_cond_branch_type_mismatch():
    then_j = _sub(lambda b: b.call("nn.relu", b.var("a", (4,), "float32")))
    else_j = _sub(lambda b: b.call("cast", b.var("a", (4,), "float32"),
                                   dtype="int32"))
    b = GraphBuilder()
    p = b.var("p", (), "bool")
    x = b.var("x", (4,), "float32")
    out = b.call("tk.cond", p, x, then_graph=then_j, else_graph=else_j)
    with pytest.raises(Exception, match="disagree"):
        infer_types(b.build(out))


def test_while_loop_countdown(rng):
    # state = (i, acc): while i < 5: acc = acc * 2 + 1; i += 1
    def cond(b):
        i = b.var("i", (), "int32")
        b.var("acc", (2, 3), "int32")  # unused but part of the state
        return b.call("less", i, b.const(np.int32(5)))
    cond_j = _sub(cond)
    def body(b):
        i = b.var("i", (), "int32")
        acc = b.var("acc", (2, 3), "int32")
        two = b.const(np.int32(2))
        one = b.const(np.int32(1))
        nacc = b.call("add", b.call("multiply", acc, two), one)
        ni = b.call("add", i, one)
        return [ni, nacc]
    body_j = _sub(body)
    b = GraphBuilder()
    i0 = b.var("i0", (), "int32")
    a0 = b.var("a0", (2, 3), "int32")
    out = b.call("tk.while_loop", i0, a0, cond_graph=cond_j,
                 body_graph=body_j)
    i_out = b.call("tuple_get_item", out, index=0)
    a_out = b.call("tuple_get_item", out, index=1)
    g = infer_types(b.build([i_out, a_out]))
    a = rng.integers(0, 5, (2, 3)).astype(np.int32)
    feeds = {"i0": np.int32(0), "a0": a}
    o = run_graph(g, feeds)
    j = run_graph_jax(g, feeds)
    want = a.copy()
    for _ in range(5):
        want = want * 2 + 1
    assert int(o[0]) == 5
    np.testing.assert_array_equal(o[1], want)
    assert (np.asarray(j[0]) == o[0]).all()
    assert (np.asarray(j[1]) == o[1]).all()


def test_control_flow_serializes_and_traces(rng):
    """JSON round-trip + trace emission with nested subgraph attrs."""
    from tachikoma_tpu.trace.emitter import emit_trace

    then_j = _sub(lambda b: b.call("nn.relu", b.var("a", (4,), "int32")))
    else_j = _sub(lambda b: b.call("negative", b.var("a", (4,), "int32")))
    b = GraphBuilder()
    p = b.var("p", (), "bool")
    x = b.var("x", (4,), "int32")
    out = b.call("tk.cond", p, x, then_graph=then_j, else_graph=else_j)
    g = infer_types(b.build(out))
    g2 = Graph.from_json(g.to_json())
    xv = rng.integers(-10, 10, (4,)).astype(np.int32)
    feeds = {"p": np.asarray(True), "x": xv}
    assert (run_graph(g2, feeds)[0] == run_graph(g, feeds)[0]).all()
    blob_np = emit_trace(g, feeds, backend="numpy")
    blob_jx = emit_trace(g, feeds, backend="jax")
    assert blob_np == blob_jx
