"""dyn.* — data-dependent shapes (ops/dyn.py + runtime/dynshape.py; the
reference's `src/relay/op/dyn/` + Relay VM runtime shapes).

dyn.nonzero is bounded (padded to max_count + valid count): static shapes,
so it runs and TRACES on every backend bit-exactly.  dyn.reshape takes its
output shape from a tensor VALUE — unrepresentable in one static program —
and runs through the dispatch-time specializer."""

import numpy as np
import pytest

from tachikoma_tpu.ir.graph import GraphBuilder
from tachikoma_tpu.ir.infer import TypeError_, infer_types
from tachikoma_tpu.runtime.dynshape import (DynShapeExecutor,
                                            has_dynamic_shapes, specialize)
from tachikoma_tpu.runtime.executor import run_graph_jax
from tachikoma_tpu.runtime.interpreter import run_graph


def _nonzero_graph(shape, max_count):
    b = GraphBuilder("nz")
    x = b.var("x", shape, "int32")
    y = b.call("dyn.nonzero", x, max_count=max_count, name="nz0")
    i0 = b.call("tuple_get_item", y, index=0, name="idx")
    i1 = b.call("tuple_get_item", y, index=1, name="cnt")
    return infer_types(b.build([i0, i1]))


def test_dyn_nonzero_oracle_vs_xla_bit_exact():
    g = _nonzero_graph((4, 6), 16)
    rng = np.random.default_rng(0)
    x = (rng.random((4, 6)) < 0.3).astype(np.int32) * rng.integers(
        1, 9, (4, 6)).astype(np.int32)
    a_idx, a_cnt = run_graph(g, [x])
    b_idx, b_cnt = run_graph_jax(g, [x])
    np.testing.assert_array_equal(np.asarray(a_idx), np.asarray(b_idx))
    np.testing.assert_array_equal(np.asarray(a_cnt), np.asarray(b_cnt))
    k = int(a_cnt[0])
    np.testing.assert_array_equal(a_idx[:k], np.argwhere(x))
    assert (a_idx[k:] == -1).all()


def test_dyn_nonzero_overflow_truncates():
    g = _nonzero_graph((8,), 3)
    x = np.ones(8, np.int32)
    idx, cnt = run_graph(g, [x])
    assert cnt[0] == 3 and idx.shape == (3, 1)
    jidx, jcnt = run_graph_jax(g, [x])
    np.testing.assert_array_equal(idx, np.asarray(jidx))
    np.testing.assert_array_equal(cnt, np.asarray(jcnt))


def test_dyn_nonzero_traces_bit_exact():
    from tachikoma_tpu.trace.emitter import TraceEmitter

    g = _nonzero_graph((4, 6), 8)
    x = np.eye(4, 6, dtype=np.int32)
    a = TraceEmitter(g, backend="oracle").emit_bytes([x])
    b = TraceEmitter(g, backend="jax").emit_bytes([x])
    assert a == b  # byte-identical trace across backends


def _dyn_reshape_graph():
    """Output shape comes from an INPUT TENSOR — unrepresentable today
    without dyn.reshape (static infer has no value to fold)."""
    b = GraphBuilder("dr")
    x = b.var("x", (2, 12), "float32")
    s = b.var("shape", (3,), "int32")
    y = b.call("dyn.reshape", x, s, name="dr0")
    z = b.call("abs", y, name="out")
    return b.build([z])


def test_dyn_reshape_specializes_and_runs_both_backends():
    g = _dyn_reshape_graph()
    assert has_dynamic_shapes(g)
    x = np.arange(24, dtype=np.float32).reshape(2, 12)
    for shp in ([2, 3, 4], [4, 3, 2], [1, 24, 1]):
        feeds = {"x": x, "shape": np.asarray(shp, np.int32)}
        want = np.abs(x.reshape(shp))
        got_o = DynShapeExecutor(g, backend="oracle").run(feeds)[0]
        np.testing.assert_array_equal(got_o, want)
        got_j = DynShapeExecutor(g, backend="jax").run(feeds)[0]
        np.testing.assert_array_equal(np.asarray(got_j), want)


def test_dyn_reshape_specialization_caches_per_shape():
    g = _dyn_reshape_graph()
    ex = DynShapeExecutor(g, backend="oracle")
    x = np.zeros((2, 12), np.float32)
    ex.run({"x": x, "shape": np.asarray([2, 3, 4], np.int32)})
    ex.run({"x": x, "shape": np.asarray([2, 3, 4], np.int32)})
    ex.run({"x": x, "shape": np.asarray([6, 2, 2], np.int32)})
    assert len(ex._cache) == 2
    sg, key = specialize(g, {"x": x,
                             "shape": np.asarray([2, 3, 4], np.int32)})
    assert key == (("dr0", (2, 3, 4)),)
    # the specialized graph is fully static and dyn-free
    assert not has_dynamic_shapes(sg)
    assert sg["dr0"].op == "reshape" and sg["dr0"].shape == (2, 3, 4)


def test_dyn_shape_propagation_and_boundary():
    """Unspecialized dynamic shapes propagate as None through value-only
    (elementwise) ops; a SHAPE-consuming op fails loudly at infer time,
    naming the node — the documented boundary."""
    g = infer_types(_dyn_reshape_graph())
    assert g["dr0"].shape is None and g["out"].shape is None

    b = GraphBuilder("drf")
    x = b.var("x", (2, 12), "float32")
    s = b.var("shape", (3,), "int32")
    y = b.call("dyn.reshape", x, s, name="dr0")
    z = b.call("nn.batch_flatten", y, name="flat")
    with pytest.raises(TypeError_) as e:
        infer_types(b.build([z]))
    assert "flat" in str(e.value)


def test_dyn_reshape_const_shape_folds_statically():
    """With a CONST shape input, specialize() needs no feeds beyond x."""
    b = GraphBuilder("drc")
    x = b.var("x", (3, 8), "float32")
    s = b.const(np.asarray([4, 6], np.int32), name="shp")
    y = b.call("dyn.reshape", x, s, name="dr0")
    g = b.build([y])
    sg, _ = specialize(g, {"x": np.zeros((3, 8), np.float32)})
    assert sg["dr0"].shape == (4, 6)
    out = run_graph(sg, [np.arange(24, dtype=np.float32).reshape(3, 8)])[0]
    assert out.shape == (4, 6)
