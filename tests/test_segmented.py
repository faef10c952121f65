"""SegmentedExecutor: graph-as-data execution for deep models.

Bit-exactness contract: segmented == whole-graph jit == numpy oracle with
`==` (integer graphs), allclose (float).  Structural sharing: N identical
float layers must compile to ONE program; scan collapse: a deep float
transformer must form a lax.scan run.
"""

import numpy as np
import pytest

from tachikoma_tpu import GraphBuilder, infer_types, run_graph
from tachikoma_tpu.models.transformer import bert, gpt2
from tachikoma_tpu.quantize.quantizer import quantize
from tachikoma_tpu.runtime.executor import JaxExecutor
from tachikoma_tpu.runtime.segmented import SegmentedExecutor, partition


def tiny_bert(layers=4, seed=0):
    return bert(batch_size=2, seq_len=16, hidden=32, layers=layers,
                heads=4, ffn_dim=64, vocab=100, seed=seed)


def test_partition_layer_boundaries():
    g = tiny_bert(layers=4)
    segs = partition(g, min_ops=10, max_ops=200)
    assert len(segs) >= 3
    total = sum(len(s) for s in segs)
    n_ops = sum(1 for n in g.nodes if not (n.is_var or n.is_const))
    assert total == n_ops


def test_float_bert_segmented_matches_whole(rng):
    g = tiny_bert(layers=4)
    x = rng.integers(0, 100, (2, 16)).astype(np.int32)
    whole = JaxExecutor(g).run(x)
    seg = SegmentedExecutor(g, min_ops=16, max_ops=120).run(x)
    for a, b in zip(whole, seg):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)


def test_float_layers_share_one_program(rng):
    g = tiny_bert(layers=6)
    ex = SegmentedExecutor(g, min_ops=16, max_ops=120, scan=False)
    # 6 identical encoder layers + embedding head + classifier tail:
    # far fewer distinct programs than segments
    assert len(ex.segments) >= 5
    assert ex.n_programs < len(ex.segments), (
        f"{ex.n_programs} programs for {len(ex.segments)} segments")
    x = rng.integers(0, 100, (2, 16)).astype(np.int32)
    whole = JaxExecutor(g).run(x)
    for a, b in zip(whole, ex.run(x)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)


def test_float_bert_forms_scan_run(rng):
    g = tiny_bert(layers=8)
    ex = SegmentedExecutor(g, min_ops=16, max_ops=120, min_scan_layers=3)
    assert ex._scan_fns, "no scan run formed over 8 identical layers"
    total_scanned = sum(i["length"] for i in ex._scan_fns.values())
    assert total_scanned >= 4
    x = rng.integers(0, 100, (2, 16)).astype(np.int32)
    whole = JaxExecutor(g).run(x)
    for a, b in zip(whole, ex.run(x)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)


def test_quantized_bert_segmented_bit_exact(rng):
    g = tiny_bert(layers=3)
    from tachikoma_tpu.quantize.config import TRANSFORMER_INT8

    calib = [rng.integers(0, 100, (2, 16)).astype(np.int32)]
    qg = quantize(g, calib, config=TRANSFORMER_INT8)
    x = calib[0]
    oracle = run_graph(qg, x)
    whole = JaxExecutor(qg).run(x)
    seg = SegmentedExecutor(qg, min_ops=16, max_ops=120).run(x)
    for o, w, s in zip(oracle, whole, seg):
        o, w, s = np.asarray(o), np.asarray(w), np.asarray(s)
        assert (o == w).all()
        assert (o == s).all(), "segmented diverges from oracle"


def test_quantized_fused_gpt2_segmented_bit_exact(rng):
    from tachikoma_tpu.quantize.config import TRANSFORMER_INT8
    from tachikoma_tpu.runtime.fuse import fuse_qnn

    g = gpt2(batch_size=1, seq_len=16, hidden=32, layers=3, heads=4,
             ffn_dim=64, vocab=96, seed=1)
    calib = [rng.integers(0, 96, (1, 16)).astype(np.int32)]
    fg = fuse_qnn(quantize(g, calib, config=TRANSFORMER_INT8))
    x = calib[0]
    oracle = run_graph(fg, x)
    seg = SegmentedExecutor(fg, min_ops=16, max_ops=120).run(x)
    for o, s in zip(oracle, seg):
        o, s = np.asarray(o), np.asarray(s)
        if o.dtype.kind in "iu":
            assert (o == s).all()
        else:
            np.testing.assert_allclose(o, s, rtol=2e-5, atol=1e-5)


def test_segmented_capture_intermediates(rng):
    """Per-op capture (the trace-emitter contract) returns every op value
    bit-identically to the whole-graph executor."""
    from tachikoma_tpu.runtime.executor import computational_nodes

    g = tiny_bert(layers=2)
    from tachikoma_tpu.quantize.config import TRANSFORMER_INT8

    calib = [rng.integers(0, 100, (2, 16)).astype(np.int32)]
    qg = quantize(g, calib, config=TRANSFORMER_INT8)
    names = computational_nodes(qg)
    x = calib[0]
    whole = JaxExecutor(qg, capture=names).run(x)
    seg = SegmentedExecutor(qg, capture=names, min_ops=16,
                            max_ops=120).run(x)
    assert len(whole) == len(seg)
    n_exact = 0
    for nm, w, s in zip(names, whole, seg):
        w, s = np.asarray(w), np.asarray(s)
        if w.dtype.kind in "iu":
            assert (w == s).all(), f"capture mismatch at {nm}"
            n_exact += 1
        else:
            np.testing.assert_allclose(w, s, rtol=2e-5, atol=1e-5,
                                       err_msg=nm)
    assert n_exact > 0


def test_segmented_multi_output_feature_taps(rng):
    """Graph outputs inside the repeated region must survive (no scan may
    swallow them)."""
    b = GraphBuilder()
    x = b.var("x", (2, 8), "float32")
    h = x
    taps = []
    for i in range(6):
        w = b.const(rng.standard_normal((8, 8)).astype(np.float32) * 0.3,
                    f"w{i}")
        h = b.call("nn.dense", h, w, name=f"d{i}")
        h = b.call("nn.relu", h, name=f"r{i}")
        if i == 3:
            taps.append(h)
    taps.append(h)
    g = infer_types(b.build(taps))
    xin = rng.standard_normal((2, 8)).astype(np.float32)
    whole = JaxExecutor(g).run(xin)
    seg = SegmentedExecutor(g, min_ops=2, max_ops=4).run(xin)
    for a, c in zip(whole, seg):
        np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6)


def test_segmented_trace_byte_identical(rng):
    """BASELINE contract: the segmented backend's trace must be
    byte-identical to the oracle's and the whole-graph XLA one."""
    from tachikoma_tpu.quantize.config import TRANSFORMER_INT8
    from tachikoma_tpu.trace.emitter import emit_trace, verify_trace

    g = tiny_bert(layers=2)
    calib = [rng.integers(0, 100, (2, 16)).astype(np.int32)]
    qg = quantize(g, calib, config=TRANSFORMER_INT8)
    x = calib[0]
    blob_np = emit_trace(qg, x, backend="numpy")
    blob_jx = emit_trace(qg, x, backend="jax")
    blob_sg = emit_trace(qg, x, backend="jax-segmented")
    assert blob_np == blob_jx
    assert blob_np == blob_sg, "segmented trace differs"
    assert verify_trace(blob_sg, qg)["mismatches"] == []


def test_scale_tied_quantized_forms_scan(rng):
    """TRANSFORMER_INT8_SCAN: tied activation+weight scales give sibling
    layers identical integer attrs, so the QUANTIZED graph scan-collapses
    (O(1) compiled programs at any depth) while staying bit-exact vs its
    own oracle."""
    from dataclasses import replace

    from tachikoma_tpu.quantize.config import (TRANSFORMER_INT8,
                                               TRANSFORMER_INT8_SCAN)
    from tachikoma_tpu.runtime.fuse import fuse_qnn

    g = gpt2(batch_size=1, seq_len=16, hidden=32, layers=6, heads=4,
             ffn_dim=64, vocab=96, seed=1)
    calib = [np.random.default_rng(0).integers(0, 96, (1, 16))
             .astype(np.int32)]
    fg = fuse_qnn(quantize(g, calib, config=TRANSFORMER_INT8_SCAN))
    ex = SegmentedExecutor(fg, min_ops=16, max_ops=120)
    assert ex._scan_fns, "tied quantized layers did not form a scan"
    assert ex.n_programs < len(ex.segments)
    o = run_graph(fg, calib[0])
    s = ex.run(calib[0])
    for a, c in zip(o, s):
        a, c = np.asarray(a), np.asarray(c)
        if a.dtype.kind in "iu":
            assert (a == c).all()
        else:
            np.testing.assert_allclose(a, c, rtol=2e-5, atol=1e-5)
    # untied baseline: per-layer attrs differ -> no sharing
    fg0 = fuse_qnn(quantize(g, calib, config=TRANSFORMER_INT8))
    ex0 = SegmentedExecutor(fg0, min_ops=16, max_ops=120)
    assert not ex0._scan_fns
    # accuracy: tied quantization stays close to per-layer quantization
    lo_t = np.asarray(run_graph(fg, calib[0])[0], np.float64).ravel()
    lo_u = np.asarray(run_graph(fg0, calib[0])[0], np.float64).ravel()
    assert np.corrcoef(lo_t, lo_u)[0, 1] > 0.95
