"""Graph IR unit tests: builder, topology, DCE, transform, hashing, serde.

Models the reference's IR-base test style (structural equality round trips,
`tvm.ir.assert_structural_equal`; SURVEY.md §4)."""

import numpy as np
import pytest

from tachikoma_tpu import Graph, GraphBuilder, infer_types, run_graph
from tachikoma_tpu.ir.graph import GraphError, Node


def small_graph():
    b = GraphBuilder("g")
    x = b.var("x", (2, 4), "float32")
    w = b.const(np.eye(4, dtype=np.float32) * 2, "w")
    y = b.call("nn.dense", x, w)
    z = b.call("nn.relu", y)
    return b.build(z)


def test_builder_and_types():
    g = infer_types(small_graph())
    assert g["nn_dense"].shape == (2, 4)
    assert g["nn_relu"].dtype == "float32"
    assert [n.name for n in g.inputs] == ["x"]


def test_topology_enforced():
    n1 = Node("a", "nn.relu", ("b",))
    n2 = Node("b", "var", shape=(1,), dtype="float32")
    with pytest.raises(GraphError):
        Graph([n1, n2], ["a"])


def test_unknown_input_rejected():
    with pytest.raises(GraphError):
        Graph([Node("a", "nn.relu", ("zzz",))], ["a"])


def test_duplicate_names_rejected():
    n = Node("a", "var", shape=(1,), dtype="float32")
    with pytest.raises(GraphError):
        Graph([n, n], ["a"])


def test_dce():
    b = GraphBuilder()
    x = b.var("x", (2,), "float32")
    dead = b.call("nn.relu", x, name="dead")
    live = b.call("tanh", x, name="live")
    g = b.build(live)
    assert "dead" not in g
    assert "live" in g


def test_structural_hash_alpha_invariant():
    def build(prefix):
        b = GraphBuilder()
        x = b.var("x", (2, 4), "float32")
        w = b.const(np.ones((4, 4), np.float32), prefix + "w")
        y = b.call("nn.dense", x, w, name=prefix + "y")
        return b.build(y)

    g1, g2 = build("a"), build("b")
    assert g1.structural_hash() == g2.structural_hash()
    assert g1.structural_equal(g2, include_params=True)

    b = GraphBuilder()
    x = b.var("x", (2, 4), "float32")
    w = b.const(np.ones((4, 4), np.float32))
    y = b.call("nn.dense", x, w, out_dtype="float32")
    g3 = b.build(y)
    assert g1.structural_hash() != g3.structural_hash()


def test_param_hash_sensitivity():
    def build(v):
        b = GraphBuilder()
        x = b.var("x", (2,), "float32")
        w = b.const(np.full((2,), v, np.float32))
        return b.build(b.call("add", x, w))

    assert build(1.0).structural_equal(build(1.0), include_params=True)
    assert not build(1.0).structural_equal(build(2.0), include_params=True)
    assert build(1.0).structural_equal(build(2.0), include_params=False)


def test_json_roundtrip():
    g = infer_types(small_graph())
    g2 = Graph.from_json(g.to_json())
    assert g.structural_equal(g2, include_params=True)
    out1 = run_graph(g, np.ones((2, 4), np.float32))
    out2 = run_graph(g2, np.ones((2, 4), np.float32))
    np.testing.assert_array_equal(out1[0], out2[0])


def test_transform_rewrite():
    g = small_graph()

    def relu_to_leaky(b, node, new_inputs):
        if node.op == "nn.relu":
            return b.call("nn.leaky_relu", *new_inputs, alpha=0.1)
        return None

    g2 = g.transform(relu_to_leaky)
    ops = [n.op for n in g2.nodes]
    assert "nn.relu" not in ops and "nn.leaky_relu" in ops
    x = np.array([[-1.0, 2.0, -3.0, 4.0]], np.float32).repeat(2, 0)
    out = run_graph(infer_types(g2), x)[0]
    np.testing.assert_allclose(out[0], [-0.2, 4.0, -0.6, 8.0], rtol=1e-6)


def test_tuple_ops():
    b = GraphBuilder()
    x = b.var("x", (4, 6), "float32")
    s = b.call("split", x, indices_or_sections=2, axis=1)
    a = b.get_item(s, 0)
    c = b.get_item(s, 1)
    y = b.call("add", a, c)
    g = infer_types(b.build(y))
    assert g[y].shape == (4, 3)
    data = np.arange(24, dtype=np.float32).reshape(4, 6)
    out = run_graph(g, data)[0]
    np.testing.assert_array_equal(out, data[:, :3] + data[:, 3:])


def test_interpreter_input_validation():
    g = infer_types(small_graph())
    with pytest.raises(ValueError):
        run_graph(g, np.ones((3, 4), np.float32))
