"""Heterogeneous per-op placement: plan propagation + split execution
bit-identical to the single-device executor, with real cross-device
transfers on the 8-virtual-device CPU mesh."""

import numpy as np

from tachikoma_tpu import GraphBuilder, infer_types, run_graph
from tachikoma_tpu.runtime.executor import JaxExecutor
from tachikoma_tpu.runtime.placement import (HeterogeneousExecutor,
                                             plan_devices)


def two_stage_mlp(rng):
    b = GraphBuilder()
    x = b.var("x", (4, 16), "float32")
    w1 = b.const(rng.standard_normal((16, 32)).astype(np.float32) * 0.1, "w1")
    h = b.call("nn.dense", x, w1, name="fc1")
    r = b.call("nn.relu", h, name="act1")
    w2 = b.const(rng.standard_normal((32, 8)).astype(np.float32) * 0.1, "w2")
    d2 = b.call("nn.dense", r, w2, name="fc2")
    b.annotate("fc2", device=1)
    s = b.call("nn.softmax", d2, name="out")
    return infer_types(b.build(s))


def test_plan_propagation(rng):
    g = two_stage_mlp(rng)
    plan = plan_devices(g)
    assert plan["fc1"] == 0 and plan["act1"] == 0
    assert plan["fc2"] == 1
    assert plan["out"] == 1          # inherits from annotated producer
    assert plan["w2"] == 1           # const follows its consumer
    assert plan["w1"] == 0


def test_heterogeneous_matches_single_device(rng):
    import jax

    g = two_stage_mlp(rng)
    x = rng.standard_normal((4, 16)).astype(np.float32)
    hx = HeterogeneousExecutor(g)
    got = hx.run({"x": x})
    assert len(hx.segments) == 2
    assert hx.transfers >= 1         # the stage boundary moved a tensor
    want = JaxExecutor(g).run({"x": x})
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
    # the oracle agrees too
    o = run_graph(g, {"x": x})
    for a, b in zip(got, o):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # outputs really live on device 1
    out_dev = hx.run_device({"x": x})[0]
    assert jax.devices()[1] in out_dev.devices()


def test_integer_graph_exact_across_devices(rng):
    b = GraphBuilder()
    x = b.var("x", (2, 64), "int8")
    w1 = b.const(rng.integers(-127, 127, (64, 64)).astype(np.int8), "w1")
    d1 = b.call("nn.dense", x, w1, out_dtype="int32", name="d1")
    r = b.call("right_shift", d1, b.const(np.int32(4)), name="rs")
    c = b.call("clip", r, a_min=-128, a_max=127, name="cl")
    q = b.call("cast", c, dtype="int8", name="q8")
    b.annotate("q8", device=2)
    w2 = b.const(rng.integers(-127, 127, (64, 16)).astype(np.int8), "w2")
    d2 = b.call("nn.dense", q, w2, out_dtype="int32", name="d2")
    g = infer_types(b.build(d2))
    x_in = rng.integers(-127, 127, (2, 64)).astype(np.int8)
    got = HeterogeneousExecutor(g).run({"x": x_in})
    want = run_graph(g, {"x": x_in})
    assert (np.asarray(got[0]) == np.asarray(want[0])).all()


def test_unannotated_graph_single_segment(rng):
    b = GraphBuilder()
    x = b.var("x", (3, 5), "float32")
    y = b.call("tanh", x)
    g = infer_types(b.build(y))
    hx = HeterogeneousExecutor(g)
    assert len(hx.segments) == 1 and hx.transfers == 0
