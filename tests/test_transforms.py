"""Graph transform tests: fold_scale_axis, simplify_inference,
simplify_transposes, remove_identity (reference analogs:
`src/relay/transforms/fold_scale_axis.cc`, `simplify_inference.cc`,
`simplify_expr.cc`)."""

import numpy as np

from tachikoma_tpu import run_graph
from tachikoma_tpu.ir.graph import GraphBuilder
from tachikoma_tpu.ir.transforms import (
    fold_scale_axis,
    remove_identity,
    simplify_inference,
    simplify_transposes,
)


def _n_ops(g, op):
    return sum(1 for n in g.nodes if n.op == op)


def test_fold_scale_axis_backward_conv(rng):
    """multiply(conv(x, w), s_per_cout) folds into the weight."""
    b = GraphBuilder("fsb")
    x = b.var("x", (2, 8, 8, 4), "float32")
    w = b.const(rng.standard_normal((3, 3, 4, 6)).astype(np.float32), name="w")
    c = b.call("nn.conv2d", x, w, name="c", strides=(1, 1), padding=(1, 1, 1, 1))
    s = b.const(rng.standard_normal((6,)).astype(np.float32), name="s")
    g = b.build([b.call("multiply", c, s, name="m")])
    g2 = fold_scale_axis(g)
    assert _n_ops(g2, "multiply") == 0
    xi = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    np.testing.assert_allclose(run_graph(g, [xi])[0], run_graph(g2, [xi])[0],
                               rtol=1e-5, atol=1e-5)


def test_fold_scale_axis_forward_conv(rng):
    """conv(multiply(x, s_per_cin), w) folds into the weight's cin axis."""
    b = GraphBuilder("fsf")
    x = b.var("x", (2, 8, 8, 4), "float32")
    s = b.const(rng.standard_normal((4,)).astype(np.float32), name="s")
    m = b.call("multiply", x, s, name="m")
    w = b.const(rng.standard_normal((3, 3, 4, 6)).astype(np.float32), name="w")
    g = b.build([b.call("nn.conv2d", m, w, name="c",
                        strides=(1, 1), padding=(1, 1, 1, 1))])
    g2 = fold_scale_axis(g)
    assert _n_ops(g2, "multiply") == 0
    xi = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    np.testing.assert_allclose(run_graph(g, [xi])[0], run_graph(g2, [xi])[0],
                               rtol=1e-5, atol=1e-5)


def test_fold_scale_axis_dense_scalar(rng):
    """Scalar scale after dense folds; multi-consumer producers do not."""
    b = GraphBuilder("fsd")
    x = b.var("x", (4, 8), "float32")
    w = b.const(rng.standard_normal((8, 5)).astype(np.float32), name="w")
    d = b.call("nn.dense", x, w, name="d")
    s = b.const(np.float32(0.5), name="s")
    g = b.build([b.call("multiply", s, d, name="m")])
    g2 = fold_scale_axis(g)
    assert _n_ops(g2, "multiply") == 0
    xi = rng.standard_normal((4, 8)).astype(np.float32)
    np.testing.assert_allclose(run_graph(g, [xi])[0], run_graph(g2, [xi])[0],
                               rtol=1e-5, atol=1e-5)

    # two consumers: fold must NOT fire (the raw conv output is still needed)
    b = GraphBuilder("fsd2")
    x = b.var("x", (4, 8), "float32")
    w = b.const(rng.standard_normal((8, 5)).astype(np.float32), name="w")
    d = b.call("nn.dense", x, w, name="d")
    m = b.call("multiply", d, b.const(np.float32(0.5), name="s"), name="m")
    g = b.build([b.call("add", m, d, name="a")])
    g2 = fold_scale_axis(g)
    assert _n_ops(g2, "multiply") == 1


def test_simplify_inference_drops_dropout_and_bn(rng):
    b = GraphBuilder("si")
    x = b.var("x", (2, 8, 8, 4), "float32")
    d = b.call("nn.dropout", x, name="drop", rate=0.5)
    gamma = b.const(rng.standard_normal(4).astype(np.float32), name="g")
    beta = b.const(rng.standard_normal(4).astype(np.float32), name="b")
    mean = b.const(rng.standard_normal(4).astype(np.float32), name="mu")
    var = b.const(np.abs(rng.standard_normal(4)).astype(np.float32) + 1, name="v")
    g = b.build([b.call("nn.batch_norm", d, gamma, beta, mean, var,
                        name="bn", epsilon=1e-5)])
    g2 = simplify_inference(g)
    assert _n_ops(g2, "nn.dropout") == 0
    assert _n_ops(g2, "nn.batch_norm") == 0
    xi = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    np.testing.assert_allclose(run_graph(g, [xi])[0], run_graph(g2, [xi])[0],
                               rtol=1e-5, atol=1e-5)


def test_simplify_transposes_collapse_and_cancel(rng):
    b = GraphBuilder("tr")
    x = b.var("x", (2, 3, 4, 5), "float32")
    t1 = b.call("transpose", x, name="t1", axes=[0, 3, 1, 2])   # NHWC->NCHW
    t2 = b.call("transpose", t1, name="t2", axes=[0, 2, 3, 1])  # NCHW->NHWC
    g = b.build([b.call("nn.relu", t2, name="r")])
    g2 = simplify_transposes(g)
    assert _n_ops(g2, "transpose") == 0
    xi = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
    np.testing.assert_allclose(run_graph(g, [xi])[0], run_graph(g2, [xi])[0])

    # non-identity composition collapses to ONE transpose
    b = GraphBuilder("tr2")
    x = b.var("x", (2, 3, 4, 5), "float32")
    t1 = b.call("transpose", x, name="t1", axes=[0, 3, 1, 2])
    t2 = b.call("transpose", t1, name="t2", axes=[1, 0, 2, 3])
    g = b.build([t2])
    g2 = simplify_transposes(g)
    assert _n_ops(g2, "transpose") == 1
    np.testing.assert_allclose(run_graph(g, [xi])[0], run_graph(g2, [xi])[0])


def test_remove_identity(rng):
    b = GraphBuilder("ri")
    x = b.var("x", (4, 6), "float32")
    c = b.call("cast", x, name="c", dtype="float32")
    r = b.call("reshape", c, name="r", newshape=[4, 6])
    g = b.build([b.call("nn.relu", r, name="out")])
    g2 = remove_identity(g)
    assert _n_ops(g2, "cast") == 0 and _n_ops(g2, "reshape") == 0
    xi = rng.standard_normal((4, 6)).astype(np.float32)
    np.testing.assert_allclose(run_graph(g, [xi])[0], run_graph(g2, [xi])[0])

    # real cast / real reshape survive
    b = GraphBuilder("ri2")
    x = b.var("x", (4, 6), "float32")
    c = b.call("cast", x, name="c", dtype="int32")
    g = b.build([c])
    assert _n_ops(remove_identity(g), "cast") == 1
