"""Text-format round trip: printed IR parses back to a structurally
equivalent graph (the relay text parser role, parser.cc:706)."""

import numpy as np

from tachikoma_tpu.ir.graph import GraphBuilder
from tachikoma_tpu.ir.infer import infer_types
from tachikoma_tpu.ir.text import parse_text, to_text
from tachikoma_tpu import run_graph


def _model(rng):
    b = GraphBuilder("txt")
    x = b.var("x", (1, 8, 8, 4), "float32")
    w = b.const(rng.standard_normal((3, 3, 4, 8)).astype(np.float32), name="w0")
    h = b.call("nn.conv2d", x, w, strides=(1, 1), padding=(1, 1, 1, 1))
    h = b.call("nn.relu", h)
    h = b.call("clip", h, a_min=-1.0, a_max=6.0)
    h = b.call("reshape", h, newshape=(1, -1))
    return infer_types(b.build([h]))


def test_text_round_trip(rng):
    g = _model(rng)
    text = to_text(g)
    g2 = parse_text(text, params=dict(g.params))
    assert [(n.name, n.op, tuple(n.inputs)) for n in g.nodes] == \
        [(n.name, n.op, tuple(n.inputs)) for n in g2.nodes]
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    np.testing.assert_array_equal(run_graph(g, [x])[0], run_graph(g2, [x])[0])


def test_text_parse_without_params(rng):
    g = _model(rng)
    g2 = parse_text(to_text(g))
    # structure preserved; consts placeholder-zero at annotated shape/dtype
    assert g2["w0"].shape == (3, 3, 4, 8)
    assert {n.op for n in g.nodes} == {n.op for n in g2.nodes}
    assert g2.outputs == g.outputs
