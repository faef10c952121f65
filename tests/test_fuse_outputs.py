"""Fusion must never swallow a node that is itself a graph output.

Regression tests for the round-2 advisor finding: Graph.users() does not
count graph outputs, so a feature-tap output with exactly one in-graph
consumer looked single-user and was fused/chained through — rewiring the
output to the fused tail's value (observed: outputs became ['c2','c2']).
"""

import numpy as np

from tachikoma_tpu import GraphBuilder, infer_types, run_graph
from tachikoma_tpu.quantize.quantizer import quantize
from tachikoma_tpu.runtime.executor import JaxExecutor
from tachikoma_tpu.runtime.fuse import fuse_conv_chains, fuse_qnn


def _conv(b, rng, src, cin, cout, name):
    w = b.const(rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
                * 0.2, name + "_w")
    c = b.call("nn.conv2d", src, w, padding=(1, 1, 1, 1), name=name)
    return b.call("nn.relu", c)


def _check_outputs(fg, qg, x):
    got = run_graph(fg, x)
    want = run_graph(qg, x)
    jx = JaxExecutor(fg).run(x)
    assert len(got) == len(want)
    for a, w, j in zip(got, want, jx):
        a, w, j = np.asarray(a), np.asarray(w), np.asarray(j)
        if a.dtype.kind in "iu":
            assert (a == w).all() and (a == j).all()
        else:
            np.testing.assert_allclose(a, w, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(a, j, rtol=1e-5, atol=1e-6)


def test_chain_fusion_preserves_feature_tap_output(rng):
    """conv c1 -> conv c2 where c1 (a feature tap) is ALSO a graph output:
    the chain pass must not extend through c1."""
    b = GraphBuilder()
    x = b.var("x", (1, 10, 10, 8), "float32")
    h1 = _conv(b, rng, x, 8, 8, "c1")
    h2 = _conv(b, rng, h1, 8, 8, "c2")
    g = infer_types(b.build([h1, h2]))
    calib = [rng.standard_normal((1, 10, 10, 8)).astype(np.float32)
             for _ in range(2)]
    qg = quantize(g, calib)
    fg = fuse_qnn(qg)
    assert len(set(fg.outputs)) == 2, fg.outputs
    _check_outputs(fg, qg, calib[0])


def test_chain_fusion_tap_inside_longer_run(rng):
    """c1 -> c2(tap output) -> c3 -> c4: the run must break AT c2; c3-c4 may
    still chain together."""
    b = GraphBuilder()
    x = b.var("x", (1, 10, 10, 8), "float32")
    h1 = _conv(b, rng, x, 8, 8, "c1")
    h2 = _conv(b, rng, h1, 8, 8, "c2")
    h3 = _conv(b, rng, h2, 8, 8, "c3")
    h4 = _conv(b, rng, h3, 8, 8, "c4")
    g = infer_types(b.build([h2, h4]))
    calib = [rng.standard_normal((1, 10, 10, 8)).astype(np.float32)
             for _ in range(2)]
    qg = quantize(g, calib)
    fg = fuse_qnn(qg)
    assert len(set(fg.outputs)) == 2, fg.outputs
    _check_outputs(fg, qg, calib[0])


def test_epilogue_fusion_preserves_acc_output(rng):
    """qnn.conv2d whose int32 accumulator is a graph output must not be
    epilogue-fused into tk.conv2d_rq (the output would silently become the
    requantized int8 value)."""
    from tachikoma_tpu.ir.graph import Graph

    b = GraphBuilder()
    x = b.var("x", (1, 6, 6, 4), "int8")
    w = b.const(rng.integers(-127, 127, (3, 3, 4, 4)).astype(np.int8), "w")
    acc = b.call("qnn.conv2d", x, w, padding=(1, 1, 1, 1), name="acc",
                 strides=(1, 1), input_zero_point=0, kernel_zero_point=0,
                 out_dtype="int32")
    rq = b.call("qnn.requantize", acc, input_scale=0.02, output_scale=0.1,
                input_zero_point=0, output_zero_point=0, out_dtype="int8",
                name="rq")
    g = infer_types(b.build([acc, rq]))
    fg = fuse_qnn(g)
    assert set(fg.outputs) == set(g.outputs)
    ops = [n.op for n in fg.nodes if not (n.is_var or n.is_const)]
    assert "tk.conv2d_rq" not in ops  # conservative: acc is observable
    xin = rng.integers(-127, 127, (1, 6, 6, 4)).astype(np.int8)
    for a, w_ in zip(run_graph(fg, xin), run_graph(g, xin)):
        assert (np.asarray(a) == np.asarray(w_)).all()
