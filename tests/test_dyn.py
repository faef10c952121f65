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
    assert key == (("dr0", ((2, 3, 4),)),)
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


# ---------------------------------------------------------------------------
# round-5 breadth: dyn.{tile, broadcast_to, full, one_hot, strided_slice,
# topk} — 8/16 of the reference dyn registry
# (/root/reference/src/relay/op/dyn/), all through the shared fold registry
# ---------------------------------------------------------------------------


def _check_dyn(build, feeds, n_static_checks=True):
    """oracle == jax == specialized-static for a dyn graph; returns the
    oracle outputs."""
    g = build()
    assert has_dynamic_shapes(g)
    outs_o = DynShapeExecutor(g, backend="oracle").run(dict(feeds))
    outs_j = DynShapeExecutor(g, backend="jax").run(dict(feeds))
    for a, b in zip(outs_o, outs_j):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    sg, _ = specialize(g, dict(feeds))
    assert not has_dynamic_shapes(sg)
    outs_s = run_graph(infer_types(sg), dict(feeds))
    for a, b in zip(outs_o, outs_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    return outs_o


def test_dyn_tile():
    def build():
        b = GraphBuilder("dt")
        x = b.var("x", (2, 3), "float32")
        r = b.var("reps", (2,), "int32")
        return b.build([b.call("dyn.tile", x, r, name="t0")])

    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    outs = _check_dyn(build, {"x": x, "reps": np.asarray([2, 3], np.int32)})
    np.testing.assert_array_equal(outs[0], np.tile(x, (2, 3)))


def test_dyn_broadcast_to():
    def build():
        b = GraphBuilder("db")
        x = b.var("x", (1, 4), "int32")
        s = b.var("shape", (3,), "int32")
        return b.build([b.call("dyn.broadcast_to", x, s, name="b0")])

    x = np.arange(4, dtype=np.int32).reshape(1, 4)
    outs = _check_dyn(build,
                      {"x": x, "shape": np.asarray([2, 5, 4], np.int32)})
    np.testing.assert_array_equal(outs[0], np.broadcast_to(x, (2, 5, 4)))


def test_dyn_full():
    def build():
        b = GraphBuilder("df")
        v = b.var("fill", (1,), "float32")
        s = b.var("shape", (2,), "int32")
        return b.build([b.call("dyn.full", v, s, name="f0")])

    outs = _check_dyn(build, {"fill": np.asarray([2.5], np.float32),
                              "shape": np.asarray([3, 4], np.int32)})
    np.testing.assert_array_equal(outs[0], np.full((3, 4), 2.5, np.float32))
    assert outs[0].dtype == np.float32


def test_dyn_one_hot():
    def build():
        b = GraphBuilder("doh")
        i = b.var("idx", (5,), "int32")
        d = b.var("depth", (1,), "int32")
        return b.build([b.call("dyn.one_hot", i, d, on_value=1,
                               off_value=0, dtype="int32", name="oh0")])

    idx = np.asarray([0, 2, 3, -1, 9], np.int32)
    outs = _check_dyn(build, {"idx": idx,
                              "depth": np.asarray([4], np.int32)})
    want = np.zeros((5, 4), np.int32)
    for r, c in enumerate([0, 2, 3]):
        want[r, c] = 1                      # -1 and 9 are out of range
    np.testing.assert_array_equal(outs[0], want)


def test_dyn_strided_slice():
    def build():
        b = GraphBuilder("dss")
        x = b.var("x", (6, 8), "float32")
        bg = b.var("begin", (2,), "int32")
        en = b.var("end", (2,), "int32")
        st = b.var("strides", (2,), "int32")
        return b.build([b.call("dyn.strided_slice", x, bg, en, st,
                               name="ss0")])

    x = np.arange(48, dtype=np.float32).reshape(6, 8)
    outs = _check_dyn(build, {
        "x": x, "begin": np.asarray([1, 0], np.int32),
        "end": np.asarray([5, 8], np.int32),
        "strides": np.asarray([2, 3], np.int32)})
    np.testing.assert_array_equal(outs[0], x[1:5:2, 0:8:3])


def test_dyn_topk():
    def build():
        b = GraphBuilder("dtk")
        x = b.var("x", (3, 7), "float32")
        k = b.var("k", (1,), "int32")
        y = b.call("dyn.topk", x, k, ret_type="both", name="tk0")
        v = b.call("tuple_get_item", y, index=0, name="vals")
        i = b.call("tuple_get_item", y, index=1, name="idxs")
        return b.build([v, i])

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 7)).astype(np.float32)
    vals, idxs = _check_dyn(build, {"x": x,
                                    "k": np.asarray([3], np.int32)})
    assert vals.shape == (3, 3) and idxs.shape == (3, 3)
    np.testing.assert_array_equal(
        vals, np.sort(x, axis=-1)[:, ::-1][:, :3])


# ---------------------------------------------------------------------------
# round-5 completion: the remaining reference dyn ops — 16/16 of
# /root/reference/src/relay/op/dyn/ (transform.cc:299,318,685,740,599;
# nn/pad.cc:109; nn/upsampling.cc:90,165; image/resize.cc:87)
# ---------------------------------------------------------------------------


def test_dyn_ones_zeros():
    def build(op):
        def b_():
            b = GraphBuilder("dc")
            s = b.var("shape", (2,), "int32")
            return b.build([b.call(op, s, dtype="int8", name="c0")])
        return b_

    for op, want in (("dyn.ones", 1), ("dyn.zeros", 0)):
        outs = _check_dyn(build(op),
                          {"shape": np.asarray([2, 5], np.int32)})
        np.testing.assert_array_equal(outs[0],
                                      np.full((2, 5), want, np.int8))
        assert outs[0].dtype == np.int8


def test_dyn_expand_dims_and_squeeze():
    def build_e():
        b = GraphBuilder("de")
        x = b.var("x", (2, 3), "float32")
        a = b.var("axis", (1,), "int32")
        return b.build([b.call("dyn.expand_dims", x, a, name="e0")])

    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    outs = _check_dyn(build_e, {"x": x, "axis": np.asarray([1], np.int32)})
    np.testing.assert_array_equal(outs[0], x[:, None, :])

    def build_s():
        b = GraphBuilder("dsq")
        x = b.var("x", (2, 1, 3, 1), "float32")
        a = b.var("axes", (2,), "int32")
        return b.build([b.call("dyn.squeeze", x, a, name="s0")])

    x4 = x.reshape(2, 1, 3, 1)
    outs = _check_dyn(build_s, {"x": x4,
                                "axes": np.asarray([1, 3], np.int32)})
    np.testing.assert_array_equal(outs[0], x)


def test_dyn_sparse_to_dense():
    def build():
        b = GraphBuilder("dstd")
        i = b.var("idx", (3, 2), "int32")
        v = b.var("vals", (3,), "float32")
        d = b.var("dflt", (), "float32")
        s = b.var("oshape", (2,), "int32")
        return b.build([b.call("dyn.sparse_to_dense", i, v, d, s,
                               name="sd0")])

    feeds = {"idx": np.asarray([[0, 0], [1, 2], [2, 3]], np.int32),
             "vals": np.asarray([1., 2., 3.], np.float32),
             "dflt": np.asarray(-1., np.float32),
             "oshape": np.asarray([3, 4], np.int32)}
    outs = _check_dyn(build, feeds)
    want = np.full((3, 4), -1., np.float32)
    want[0, 0], want[1, 2], want[2, 3] = 1., 2., 3.
    np.testing.assert_array_equal(outs[0], want)


def test_dyn_nn_pad():
    def build():
        b = GraphBuilder("dp")
        x = b.var("x", (2, 3), "int32")
        pw = b.var("pw", (2, 2), "int32")
        pv = b.var("pv", (), "int32")
        return b.build([b.call("dyn.nn.pad", x, pw, pv, name="p0")])

    x = np.arange(6, dtype=np.int32).reshape(2, 3)
    feeds = {"x": x, "pw": np.asarray([[1, 0], [2, 1]], np.int32),
             "pv": np.asarray(7, np.int32)}
    outs = _check_dyn(build, feeds)
    np.testing.assert_array_equal(
        outs[0], np.pad(x, [(1, 0), (2, 1)], constant_values=7))


def test_dyn_nn_upsampling_2d_3d():
    def build2():
        b = GraphBuilder("du2")
        x = b.var("x", (1, 2, 3, 4), "float32")
        sh = b.var("sh", (), "float32")
        sw = b.var("sw", (), "float32")
        return b.build([b.call("dyn.nn.upsampling", x, sh, sw, name="u0")])

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 2, 3, 4)).astype(np.float32)
    outs = _check_dyn(build2, {"x": x,
                               "sh": np.asarray(2.0, np.float32),
                               "sw": np.asarray(3.0, np.float32)})
    assert outs[0].shape == (1, 4, 9, 4)
    np.testing.assert_array_equal(outs[0][0, :, :, 0],
                                  x[0, :, :, 0].repeat(2, 0).repeat(3, 1))

    def build3():
        b = GraphBuilder("du3")
        x = b.var("x", (1, 2, 2, 3, 4), "float32")
        sd = b.var("sd", (), "float32")
        sh = b.var("sh", (), "float32")
        sw = b.var("sw", (), "float32")
        return b.build([b.call("dyn.nn.upsampling3d", x, sd, sh, sw,
                               name="u3")])

    x3 = rng.standard_normal((1, 2, 2, 3, 4)).astype(np.float32)
    outs = _check_dyn(build3, {"x": x3,
                               "sd": np.asarray(2.0, np.float32),
                               "sh": np.asarray(2.0, np.float32),
                               "sw": np.asarray(1.0, np.float32)})
    assert outs[0].shape == (1, 4, 4, 3, 4)


def test_dyn_image_resize2d():
    def build():
        b = GraphBuilder("drz")
        x = b.var("x", (1, 4, 4, 2), "float32")
        s = b.var("size", (2,), "int32")
        return b.build([b.call("dyn.image.resize2d", x, s,
                               method="nearest_neighbor", name="rz0")])

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    outs = _check_dyn(build, {"x": x,
                              "size": np.asarray([8, 8], np.int32)})
    assert outs[0].shape == (1, 8, 8, 2)
    np.testing.assert_array_equal(outs[0][0, :, :, 0],
                                  x[0, :, :, 0].repeat(2, 0).repeat(2, 1))


def test_dyn_cache_keys_include_all_folds():
    """dyn.full folds BOTH inputs — distinct fill values must be distinct
    cache entries even at the same shape."""
    b = GraphBuilder("dfk")
    v = b.var("fill", (1,), "float32")
    s = b.var("shape", (2,), "int32")
    g = b.build([b.call("dyn.full", v, s, name="f0")])
    ex = DynShapeExecutor(g, backend="oracle")
    shp = np.asarray([2, 2], np.int32)
    a = ex.run({"fill": np.asarray([1.0], np.float32), "shape": shp})[0]
    c = ex.run({"fill": np.asarray([3.0], np.float32), "shape": shp})[0]
    assert len(ex._cache) == 2
    assert a[0, 0] == 1.0 and c[0, 0] == 3.0


def test_dyn_mixed_chain_specializes():
    """A graph mixing two different dyn ops specializes in one pass."""
    b = GraphBuilder("dmix")
    x = b.var("x", (2, 6), "float32")
    s = b.var("shape", (2,), "int32")
    r = b.var("reps", (2,), "int32")
    y = b.call("dyn.reshape", x, s, name="r0")
    z = b.call("dyn.tile", y, r, name="t0")
    g = b.build([z])
    feeds = {"x": np.arange(12, dtype=np.float32).reshape(2, 6),
             "shape": np.asarray([3, 4], np.int32),
             "reps": np.asarray([2, 1], np.int32)}
    got = DynShapeExecutor(g, backend="oracle").run(feeds)[0]
    want = np.tile(feeds["x"].reshape(3, 4), (2, 1))
    np.testing.assert_array_equal(got, want)
    gj = DynShapeExecutor(g, backend="jax").run(feeds)[0]
    np.testing.assert_array_equal(np.asarray(gj), want)
