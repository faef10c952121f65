"""Frame-chained convs: bit-exact vs the sequential production op across
kernel sizes, zero points, channel widths, and batch tails (interpret mode
on CPU; the same kernels run compiled on the chip)."""

import numpy as np
import pytest

from tachikoma_tpu.ops.pallas.conv_flat import (qconv2d_flat,
                                                qconv2d_flat_chain)
from tachikoma_tpu.ops.pallas.qms32 import plan_requantize


def _mkstage(rng, kh, cin, cout, scale_in, scale_out, izp, out_zp):
    m, s = plan_requantize(scale_in, scale_out)
    pad = kh // 2
    return dict(w=rng.integers(-127, 127, (kh, kh, cin, cout)).astype(np.int8),
                bias=rng.integers(-1000, 1000, (cout,)).astype(np.int32),
                multiplier=m, shift=s, izp=izp, out_zp=out_zp,
                padding=(pad, pad, pad, pad))


def _sequential(x, stages):
    cur = x
    for st in stages:
        cur = np.asarray(qconv2d_flat(
            cur, st["w"], bias=st["bias"], multiplier=st["multiplier"],
            shift=st["shift"], strides=(1, 1), padding=st["padding"],
            input_zero_point=st["izp"], out_zp=st["out_zp"]))
    return cur


def _check(x, stages):
    got = np.asarray(qconv2d_flat_chain(x, stages, interpret=True))
    want = _sequential(x, stages)
    assert got.shape == want.shape
    assert (got == want).all(), (
        f"mismatch: {np.abs(got.astype(int) - want.astype(int)).max()}")


def test_chain_3x3_3x3(rng):
    stages = [_mkstage(rng, 3, 16, 16, 4e-4, 5e-2, 0, 0),
              _mkstage(rng, 3, 16, 16, 5e-2, 3e-2, 0, 0)]
    x = rng.integers(-127, 127, (2, 10, 10, 16)).astype(np.int8)
    _check(x, stages)


def test_chain_bottleneck_zero_points(rng):
    stages = [_mkstage(rng, 1, 16, 32, 4e-4, 5e-2, 3, 2),
              _mkstage(rng, 3, 32, 32, 5e-2, 4e-2, 2, -1),
              _mkstage(rng, 1, 32, 24, 4e-2, 6e-2, -1, 0)]
    x = rng.integers(-127, 127, (2, 12, 12, 16)).astype(np.int8)
    _check(x, stages)


def test_chain_mixed_kernel_sizes(rng):
    stages = [_mkstage(rng, 5, 8, 16, 4e-4, 5e-2, 1, 0),
              _mkstage(rng, 3, 16, 16, 5e-2, 4e-2, 0, 1),
              _mkstage(rng, 1, 16, 8, 4e-2, 5e-2, 1, 0)]
    x = rng.integers(-127, 127, (1, 9, 9, 8)).astype(np.int8)
    _check(x, stages)


def test_chain_wide_channels(rng):
    # cin > 128: multi-K-block path inside the frame kernel
    stages = [_mkstage(rng, 3, 144, 130, 4e-4, 5e-2, 0, 0),
              _mkstage(rng, 3, 130, 64, 5e-2, 4e-2, 0, 0)]
    x = rng.integers(-127, 127, (1, 8, 8, 144)).astype(np.int8)
    _check(x, stages)


def test_chain_batch_tail(rng):
    # odd batch x odd spatial: exercises frame tail masking between images
    stages = [_mkstage(rng, 3, 8, 8, 4e-4, 5e-2, 2, 3),
              _mkstage(rng, 3, 8, 8, 5e-2, 4e-2, 3, -2)]
    x = rng.integers(-127, 127, (3, 7, 7, 8)).astype(np.int8)
    _check(x, stages)


def test_chain_single_stage_degenerate(rng):
    stages = [_mkstage(rng, 3, 8, 8, 4e-4, 5e-2, 1, 2)]
    x = rng.integers(-127, 127, (2, 8, 8, 8)).astype(np.int8)
    _check(x, stages)


def test_chain_rejects_spatial_change(rng):
    st = _mkstage(rng, 3, 8, 8, 4e-4, 5e-2, 0, 0)
    st["padding"] = (0, 0, 0, 0)  # valid conv shrinks the image
    x = rng.integers(-127, 127, (1, 8, 8, 8)).astype(np.int8)
    with pytest.raises(AssertionError):
        qconv2d_flat_chain(x, [st], interpret=True)


def test_graph_level_chain_fusion(rng):
    """quantize -> fuse produces tk.conv2d_chain; oracle == XLA (Pallas
    interpret) == the unfused quantized graph, bit-exact."""
    import os

    from tachikoma_tpu import GraphBuilder, infer_types, run_graph
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.runtime.executor import JaxExecutor
    from tachikoma_tpu.runtime.fuse import fuse_qnn

    b = GraphBuilder()
    x = b.var("x", (2, 12, 12, 8), "float32")

    def convrelu(src, cin, cout, name):
        w = b.const(rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
                    * 0.2, name + "_w")
        bias = b.const(rng.standard_normal(cout).astype(np.float32) * 0.1,
                       name + "_b")
        c = b.call("nn.conv2d", src, w, padding=(1, 1, 1, 1), name=name)
        c = b.call("nn.bias_add", c, bias, axis=-1)
        return b.call("nn.relu", c)

    h = convrelu(convrelu(convrelu(x, 8, 16, "c1"), 16, 16, "c2"), 16, 8,
                 "c3")
    g = infer_types(b.build(h))
    calib = [rng.standard_normal((2, 12, 12, 8)).astype(np.float32)
             for _ in range(2)]
    qg = quantize(g, calib)
    fg = fuse_qnn(qg)
    ops = [n.op for n in fg.nodes if not (n.is_var or n.is_const)]
    assert "tk.conv2d_chain" in ops
    assert "tk.conv2d_rq" not in ops  # all three convs joined one chain

    o = run_graph(fg, calib[0])
    os.environ["TK_FORCE_PALLAS"] = "1"
    try:
        j = JaxExecutor(fg).run(calib[0])
    finally:
        os.environ.pop("TK_FORCE_PALLAS", None)
    uo = run_graph(qg, calib[0])
    for a, c, u in zip(o, j, uo):
        a, c, u = np.asarray(a), np.asarray(c), np.asarray(u)
        if a.dtype.kind in "iu":
            assert (a == c).all() and (a == u).all()
        else:
            np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(a, u, rtol=1e-5, atol=1e-6)


def test_chain_wide_bn(rng):
    stages = [_mkstage(rng, 1, 8, 260, 4e-4, 5e-2, 0, 1),
              _mkstage(rng, 3, 260, 260, 5e-2, 4e-2, 1, 0)]
    x = rng.integers(-127, 127, (1, 9, 9, 8)).astype(np.int8)
    got = np.asarray(qconv2d_flat_chain(x, stages, bn_cap=256,
                                        interpret=True))
    want = _sequential(x, stages)
    assert (got == want).all()


def test_chain_graph_traces(rng):
    """Trace emission of a chain-fused graph: oracle and XLA backends emit
    byte-identical traces and the semantic verifier passes."""
    from tachikoma_tpu import GraphBuilder, infer_types
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.runtime.fuse import fuse_qnn
    from tachikoma_tpu.trace.emitter import emit_trace, verify_trace

    b = GraphBuilder()
    x = b.var("x", (1, 10, 10, 8), "float32")

    def conv(src, cin, cout, name):
        w = b.const(rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
                    * 0.2, name + "_w")
        c = b.call("nn.conv2d", src, w, padding=(1, 1, 1, 1), name=name)
        return b.call("nn.relu", c)

    g = infer_types(b.build(conv(conv(x, 8, 8, "c1"), 8, 8, "c2")))
    calib = [rng.standard_normal((1, 10, 10, 8)).astype(np.float32)
             for _ in range(2)]
    fg = fuse_qnn(quantize(g, calib))
    assert any(n.op == "tk.conv2d_chain" for n in fg.nodes)
    blob_np = emit_trace(fg, calib[0], backend="numpy")
    blob_jx = emit_trace(fg, calib[0], backend="jax")
    assert blob_np == blob_jx
    assert verify_trace(blob_np, fg)["mismatches"] == []


def test_graph_level_residual_fusion(rng):
    """Residual bottleneck: the qnn.add (+clip) after a chain folds into
    the chain's last-stage epilogue (res_add); oracle == XLA == the
    unfused graph, bit-exact."""
    import os

    from tachikoma_tpu import GraphBuilder, infer_types, run_graph
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.runtime.executor import JaxExecutor
    from tachikoma_tpu.runtime.fuse import fuse_qnn

    b = GraphBuilder()
    x = b.var("x", (2, 12, 12, 16), "float32")

    def conv(src, cin, cout, name, relu=True):
        w = b.const(rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
                    * 0.2, name + "_w")
        c = b.call("nn.conv2d", src, w, padding=(1, 1, 1, 1), name=name)
        return b.call("nn.relu", c) if relu else c

    h1 = conv(conv(x, 16, 16, "c1"), 16, 16, "c2", relu=False)
    res = b.call("add", h1, x, name="res")      # residual join
    h2 = b.call("nn.relu", res)
    g = infer_types(b.build(h2))
    calib = [rng.standard_normal((2, 12, 12, 16)).astype(np.float32)
             for _ in range(2)]
    qg = quantize(g, calib)
    fg = fuse_qnn(qg)
    chains = [n for n in fg.nodes if n.op == "tk.conv2d_chain"]
    assert chains and any(n.attrs.get("res_add") for n in chains), \
        [n.op for n in fg.nodes]
    assert not any(n.op == "qnn.add" for n in fg.nodes)

    o = run_graph(fg, calib[0])
    u = run_graph(qg, calib[0])
    os.environ["TK_FORCE_PALLAS"] = "1"
    try:
        j = JaxExecutor(fg).run(calib[0])
    finally:
        os.environ.pop("TK_FORCE_PALLAS", None)
    for a, w_, c in zip(o, u, j):
        a, w_, c = np.asarray(a), np.asarray(w_), np.asarray(c)
        assert (a == w_).all(), "fused residual chain != unfused oracle"
        assert (a == c).all(), "oracle != Pallas path"


def test_chain_bm_from_tune_db(rng):
    """With no explicit bm, qconv2d_flat_chain picks the tuned {bm, bn} for
    its chain geometry from the active dispatch database (and still computes
    the exact result)."""
    from tachikoma_tpu.ops.pallas.conv_flat import chain_workload
    from tachikoma_tpu.tune.database import (NO_ERROR, TuneDatabase,
                                             TuneRecord, apply_history_best)

    stages = [_mkstage(rng, 3, 8, 8, 0.02, 0.03, 0, 0) for _ in range(2)]
    x = rng.integers(-127, 127, (1, 10, 10, 8)).astype(np.int8)
    want = _sequential(x, stages)

    dims = [(3, 8, 8)] * 2
    db = TuneDatabase()
    db.add(TuneRecord(chain_workload(1, 10, 10, dims),
                      {"bm": 256, "bn": 128}, 1.0, NO_ERROR, ""))

    seen = {}
    import tachikoma_tpu.ops.pallas.conv_flat as cf
    orig = cf.chain_frame_geometry

    def spy(n, h, w, st, bm=512):
        seen["bm"] = bm
        return orig(n, h, w, st, bm)

    cf.chain_frame_geometry = spy
    try:
        with apply_history_best(db):
            got = np.asarray(qconv2d_flat_chain(x, stages, interpret=True))
    finally:
        cf.chain_frame_geometry = orig
    assert seen["bm"] == 256          # the DB record was honored
    assert np.array_equal(got, want)  # and the result is still exact


def test_chain_batch_split_prefers_deep_k():
    """Large batches must SPLIT rather than shrink the K block: a chain
    whose frame window cannot hold the preferred 512-deep block at the full
    batch runs sub-batches under lax.map instead of paying sequential
    k-passes (measured 28.2 ms for ResNet-50 b32 stage3 at bk=128).  With
    the minimal-hp tail-pad geometry the b32 H14 window itself now fits
    bk=512 unsplit — the invariant is 'whatever nb is chosen, the preferred
    block fits', not a particular split."""
    from tachikoma_tpu.ops.pallas.conv_flat import (chain_batch_split,
                                                    chain_frame_geometry)

    geo = [(1, 1, 0, 0, 0, 0), (3, 3, 1, 1, 1, 1), (1, 1, 0, 0, 0, 0)]
    for n in (32, 64):
        nb = chain_batch_split(n, 14, 14, geo, ci_list=[1024, 256, 256])
        assert nb is not None and n % nb == 0, (n, nb)
        # the chosen sub-batch supports the preferred 512-deep block
        mp = chain_frame_geometry(nb, 14, 14, geo, 512)[3]
        assert 2 * (mp + 2 * 512) * 512 <= 12 * 1024 * 1024
    # b64 H14 exceeds the window at bk=512 whole — it must actually split
    assert chain_batch_split(64, 14, 14, geo, ci_list=[1024, 256, 256]) < 64
    # small batches stay whole when the deep block fits
    assert chain_batch_split(8, 14, 14, geo, ci_list=[1024, 256, 256]) == 8
    # geometries that fit at no sub-batch return None (fuse leaves them
    # sequential) — a degenerate huge-spatial case
    assert chain_batch_split(1, 2048, 2048, [(3, 3, 1, 1, 1, 1)],
                             ci_list=[128]) is None


# ---------------------------------------------------------------------------
# width-packing (wpack2): sub-128-channel chains run as C>=128 chains over a
# (N,H,W/2,2C)-reshaped image with block-structured weights — exact, and a
# strict 2x padded-MAC reduction for C<=64 3x3 stages
# ---------------------------------------------------------------------------


def test_wpack2_eligibility_rules(rng):
    from tachikoma_tpu.ops.pallas.conv_flat import _chain_wpack2_eligible

    st33 = _mkstage(rng, 3, 64, 64, 4e-4, 5e-2, 0, 0)
    st11 = _mkstage(rng, 1, 64, 64, 4e-4, 5e-2, 0, 0)
    st11_wide = _mkstage(rng, 1, 64, 256, 4e-4, 5e-2, 0, 0)
    st33_wide = _mkstage(rng, 3, 128, 128, 4e-4, 5e-2, 0, 0)
    st55 = _mkstage(rng, 5, 32, 32, 4e-4, 5e-2, 0, 0)
    assert _chain_wpack2_eligible(56, [st11, st33, st11_wide])  # stage1 shape
    assert not _chain_wpack2_eligible(55, [st33])        # odd W
    assert not _chain_wpack2_eligible(56, [st33_wide])   # C128 3x3 would LOSE
    assert not _chain_wpack2_eligible(56, [st55])        # kw=5 unsupported
    assert not _chain_wpack2_eligible(56, [st11_wide])   # equal cost, no gain


def test_wpack2_packed_equals_unpacked(rng):
    """The packed execution is bit-identical to the unpacked chain AND the
    sequential oracle on a ResNet-stage1-shaped bottleneck (1x1 64->64,
    3x3 64->64, 1x1 64->96) with zero points."""
    stages = [_mkstage(rng, 1, 64, 64, 4e-4, 5e-2, 2, 1),
              _mkstage(rng, 3, 64, 64, 5e-2, 4e-2, 1, -1),
              _mkstage(rng, 1, 64, 96, 4e-2, 6e-2, -1, 0)]
    x = rng.integers(-127, 127, (2, 8, 8, 64)).astype(np.int8)
    packed = np.asarray(qconv2d_flat_chain(x, stages, interpret=True))
    unpacked = np.asarray(qconv2d_flat_chain(x, stages, interpret=True,
                                             wpack=False))
    want = _sequential(x, stages)
    assert (unpacked == want).all()
    assert (packed == want).all()


def test_wpack2_residual_epilogue(rng):
    """Packed chain with the fused qnn.add residual epilogue: the residual
    is width-packed by the same free reshape; bit-exact vs the unpacked
    residual chain."""
    stages = [_mkstage(rng, 3, 32, 32, 4e-4, 5e-2, 0, 0),
              _mkstage(rng, 3, 32, 32, 5e-2, 4e-2, 0, 3)]
    x = rng.integers(-127, 127, (1, 8, 8, 32)).astype(np.int8)
    res = rng.integers(-127, 127, (1, 8, 8, 32)).astype(np.int8)
    rp = dict(lhs_scale=4e-2, lhs_zero_point=3, rhs_scale=3e-2,
              rhs_zero_point=-2, output_scale=5e-2, output_zero_point=1,
              rounding="UPWARD")
    got = np.asarray(qconv2d_flat_chain(x, stages, interpret=True,
                                        residual=res, res_params=rp))
    want = np.asarray(qconv2d_flat_chain(x, stages, interpret=True,
                                         residual=res, res_params=rp,
                                         wpack=False))
    assert (got == want).all()


def test_wpack2_weight_rewrite_direct(rng):
    """_wpack2_stage vs brute force: the packed conv over the reshaped
    image equals the original conv for kw in {1, 3} (single stage, exact)."""
    for kw in (1, 3):
        stages = [_mkstage(rng, kw, 16, 24, 3e-3, 4e-2, 1, 0)]
        x = rng.integers(-127, 127, (1, 6, 10, 16)).astype(np.int8)
        got = np.asarray(qconv2d_flat_chain(x, stages, interpret=True))
        want = _sequential(x, stages)
        assert (got == want).all(), f"kw={kw}"


def test_wpack2_force_and_fallback(rng):
    """Round-4 advisor findings: wpack=True FORCES packing on a structurally
    legal chain (even one with no strict gain), raises ValueError on an
    ineligible one, and auto mode falls back to the unpacked path instead
    of asserting when the packed geometry fits no frame."""
    import pytest
    from tachikoma_tpu.ops.pallas import conv_flat as cf

    # force on a no-gain (equal-cost) chain: 1x1 C64->C256 packs to
    # C128->C512 at half the positions — legal, zero gain; True must pack
    st = _mkstage(rng, 1, 64, 256, 4e-4, 5e-2, 0, 0)
    x = rng.integers(-127, 127, (1, 6, 8, 64)).astype(np.int8)
    got = np.asarray(qconv2d_flat_chain(x, [st], interpret=True, wpack=True))
    want = _sequential(x, [st])
    assert (got == want).all()

    # force on an ineligible chain (kw=5) raises, never silently unpacks
    st5 = _mkstage(rng, 5, 32, 32, 4e-4, 5e-2, 0, 0)
    x5 = rng.integers(-127, 127, (1, 8, 8, 32)).astype(np.int8)
    with pytest.raises(ValueError, match="ineligible"):
        qconv2d_flat_chain(x5, [st5], interpret=True, wpack=True)

    # infeasible packing falls back to unpacked in auto mode: force the
    # probe to report infeasible and check the chain still runs (unpacked)
    from unittest import mock

    stages = [_mkstage(rng, 3, 64, 64, 4e-4, 5e-2, 0, 0)]
    xs = rng.integers(-127, 127, (1, 8, 8, 64)).astype(np.int8)
    assert cf._chain_wpack2_eligible(8, stages)
    assert cf._wpack2_feasible(1, 8, 8, stages, 128, 512)  # normally fits
    with mock.patch.object(cf, "_wpack2_feasible", return_value=False), \
         mock.patch.object(cf, "_wpack2_stage",
                           side_effect=AssertionError("must not pack")):
        got = np.asarray(qconv2d_flat_chain(xs, stages, interpret=True))
    assert (got == _sequential(xs, stages)).all()
    # and forced packing on an infeasible geometry raises instead
    with mock.patch.object(cf, "_wpack2_feasible", return_value=False), \
         pytest.raises(ValueError, match="no frame geometry"):
        qconv2d_flat_chain(xs, stages, interpret=True, wpack=True)


def test_wpack2_explicit_bm_survives_packed_record(rng):
    """Caller-supplied bm/bn_cap must NOT be overridden by a committed
    packed-geometry tune record (tuner trials measure their own config)."""
    from unittest import mock
    from tachikoma_tpu.ops.pallas import conv_flat as cf

    stages = [_mkstage(rng, 3, 64, 64, 4e-4, 5e-2, 0, 0)]
    x = rng.integers(-127, 127, (1, 8, 8, 64)).astype(np.int8)
    seen = []
    real = cf._build_flat_conv_frame

    def spy(mp, cur_rows, ci_p, co_p, kh, kw_, wph, bm, *a, **k):
        seen.append(bm)
        return real(mp, cur_rows, ci_p, co_p, kh, kw_, wph, bm, *a, **k)

    with mock.patch.object(cf, "_build_flat_conv_frame", side_effect=spy), \
         mock.patch("tachikoma_tpu.tune.database.lookup_config",
                    return_value={"bm": 1024, "bn": 256}):
        qconv2d_flat_chain(x, stages, bm=512, interpret=True)
    assert seen and all(b == 512 for b in seen)


# ---------------------------------------------------------------------------
# block STACKS (round 5, stage-persistent layouts): consecutive identity-
# residual blocks run entirely in frame layout — entry/exit paid once —
# bit-exact vs the per-block chain + qnn.add path
# ---------------------------------------------------------------------------


def _qadd_ref(a, b, rp):
    """Reference qnn.add on int8 tensors (ops/qnn semantics)."""
    from tachikoma_tpu.ops.fixed_point import requantize_np

    so = float(rp["output_scale"])
    zo = int(rp.get("output_zero_point", 0))

    def req(v, sc, zc):
        if float(sc) == so and int(zc) == zo:
            return v.astype(np.int32)
        return requantize_np(v.astype(np.int32), float(sc), int(zc), so, zo,
                             rounding=rp.get("rounding", "UPWARD"),
                             out_dtype="int32")

    lo = max(int(rp.get("a_min", -128)), -128)
    hi = min(int(rp.get("a_max", 127)), 127)
    return np.clip(req(a, rp["lhs_scale"], rp.get("lhs_zero_point", 0))
                   + req(b, rp["rhs_scale"], rp.get("rhs_zero_point", 0))
                   - np.int32(zo), lo, hi).astype(np.int8)


def _stack_ref(x, blocks):
    cur = x
    for (sts, rp) in blocks:
        y = _sequential(cur, sts)
        if rp is not None:
            y = _qadd_ref(y, cur, rp)
        cur = y
    return cur


def _mkblock(rng, cin, mid, s_in, izp, zadd, kh=3):
    """Identity bottleneck: 1x1 cin->mid, kh x kh mid->mid, 1x1 mid->cin,
    fused residual add back to izp domain with output zp zadd."""
    s1, s2, s3 = 5e-2, 4e-2, 6e-2
    sts = [_mkstage(rng, 1, cin, mid, s_in, s1, izp, 1),
           _mkstage(rng, kh, mid, mid, s1, s2, 1, -2),
           _mkstage(rng, 1, mid, cin, s2, s3, -2, 2)]
    rp = dict(lhs_scale=s3, lhs_zero_point=2, rhs_scale=s_in,
              rhs_zero_point=izp, output_scale=s_in, output_zero_point=zadd,
              rounding="UPWARD")
    return (sts, rp)


def test_block_stack_two_identity_blocks(rng):
    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat_block_stack

    s_in = 3e-2
    b1 = _mkblock(rng, 16, 8, s_in, 3, 3)     # zadd == next izp
    b2 = _mkblock(rng, 16, 8, s_in, 3, 0)
    x = rng.integers(-127, 127, (2, 9, 10, 16)).astype(np.int8)
    got = np.asarray(qconv2d_flat_block_stack(x, [b1, b2], interpret=True))
    want = _stack_ref(x, [b1, b2])
    assert got.shape == want.shape
    assert (got == want).all(), \
        np.abs(got.astype(int) - want.astype(int)).max()


def test_block_stack_three_blocks_with_clip(rng):
    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat_block_stack

    s_in = 2e-2
    blocks = []
    for i, zadd in enumerate((1, -3, 0)):
        izp = 1 if i == 0 else (1, -3, 0)[i - 1]
        (sts, rp) = _mkblock(rng, 24, 16, s_in, izp, zadd)
        rp["a_min"], rp["a_max"] = -100, 100
        blocks.append((sts, rp))
    x = rng.integers(-127, 127, (1, 8, 8, 24)).astype(np.int8)
    got = np.asarray(qconv2d_flat_block_stack(x, blocks, interpret=True))
    want = _stack_ref(x, blocks)
    assert (got == want).all(), \
        np.abs(got.astype(int) - want.astype(int)).max()


def test_block_stack_mixed_residual_and_plain(rng):
    """A block without residual in the middle of the stack (plain chain)
    still persists the frame layout."""
    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat_block_stack

    s_in = 3e-2
    b1 = _mkblock(rng, 16, 8, s_in, 0, 2)
    mid = ([_mkstage(rng, 3, 16, 16, s_in, s_in, 2, 1)], None)
    b3 = _mkblock(rng, 16, 8, s_in, 1, 0)
    x = rng.integers(-127, 127, (2, 8, 8, 16)).astype(np.int8)
    got = np.asarray(qconv2d_flat_block_stack(x, [b1, mid, b3],
                                              interpret=True))
    want = _stack_ref(x, [b1, mid, b3])
    assert (got == want).all(), \
        np.abs(got.astype(int) - want.astype(int)).max()


def test_block_stack_wpack_eligible(rng):
    """C<=64 stacks width-pack as a whole (stage1 geometry)."""
    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat_block_stack

    s_in = 3e-2
    b1 = _mkblock(rng, 32, 16, s_in, 0, 1)
    b2 = _mkblock(rng, 32, 16, s_in, 1, 0)
    x = rng.integers(-127, 127, (1, 6, 8, 32)).astype(np.int8)
    got = np.asarray(qconv2d_flat_block_stack(x, [b1, b2], interpret=True))
    nop = np.asarray(qconv2d_flat_block_stack(x, [b1, b2], interpret=True,
                                              wpack=False))
    want = _stack_ref(x, [b1, b2])
    assert (nop == want).all()
    assert (got == want).all()


def test_graph_level_block_stack_fusion(rng):
    """quantize -> fuse on a 3-identity-block residual tower produces ONE
    tk.conv2d_block_stack; oracle == XLA (Pallas interpret) == the unfused
    quantized graph, bit-exact."""
    import os

    from tachikoma_tpu import GraphBuilder, infer_types, run_graph
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.runtime.executor import JaxExecutor
    from tachikoma_tpu.runtime.fuse import fuse_qnn

    b = GraphBuilder()
    x = b.var("x", (2, 10, 10, 16), "float32")

    def conv(src, cin, cout, name, relu=True):
        w = b.const(rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
                    * 0.15, name + "_w")
        c = b.call("nn.conv2d", src, w, padding=(1, 1, 1, 1), name=name)
        return b.call("nn.relu", c) if relu else c

    h = x
    for i in range(3):
        y = conv(conv(h, 16, 16, f"b{i}c1"), 16, 16, f"b{i}c2", relu=False)
        h = b.call("nn.relu", b.call("add", y, h, name=f"b{i}add"))
    g = infer_types(b.build(h))
    calib = [rng.standard_normal((2, 10, 10, 16)).astype(np.float32)
             for _ in range(2)]
    qg = quantize(g, calib)
    fg = fuse_qnn(qg)
    ops = [n.op for n in fg.nodes if not (n.is_var or n.is_const)]
    assert "tk.conv2d_block_stack" in ops
    # at most the first block stays a lone chain (its producer is the
    # graph input, not an identity block)
    assert ops.count("tk.conv2d_chain") <= 1

    o = run_graph(fg, calib[0])
    os.environ["TK_FORCE_PALLAS"] = "1"
    try:
        j = JaxExecutor(fg).run(calib[0])
    finally:
        os.environ.pop("TK_FORCE_PALLAS", None)
    u = run_graph(qg, calib[0])
    for a, c, uu in zip(o, j, u):
        a, c, uu = np.asarray(a), np.asarray(c), np.asarray(uu)
        if a.dtype.kind in "iu":
            assert (a == c).all() and (a == uu).all()
        else:
            np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(a, uu, rtol=1e-5, atol=1e-6)
