"""Integer transformer path: BERT/ViT quantization with the deterministic
softmax-free (LUT) attention — BASELINE configs 4-5 semantics."""

import numpy as np
import pytest

from tachikoma_tpu import GraphBuilder, infer_types, run_graph
from tachikoma_tpu.models.transformer import bert, vit
from tachikoma_tpu.ops.qnn import SOFTMAX_OUT_ZP, build_lut, softmax_exp_table
from tachikoma_tpu.quantize.config import TRANSFORMER_INT8
from tachikoma_tpu.quantize.quantizer import quantize
from tachikoma_tpu.runtime.executor import JaxExecutor


def tiny_bert():
    return bert(batch_size=2, seq_len=16, hidden=64, layers=2, heads=4,
                ffn_dim=128, vocab=100)


@pytest.fixture(scope="module")
def qbert():
    g = tiny_bert()
    rng = np.random.default_rng(0)
    data = [{"input_ids": rng.integers(0, 100, (2, 16)).astype(np.int32)} for _ in range(3)]
    return g, quantize(g, data, TRANSFORMER_INT8), data[0]


def test_qnn_softmax_exact_properties(rng):
    b = GraphBuilder()
    x = b.var("x", (4, 32), "int8")
    s = b.call("qnn.softmax", x, input_scale=0.08, axis=-1)
    g = infer_types(b.build(s))
    data = rng.integers(-128, 128, (4, 32), dtype=np.int64).astype(np.int8)
    out = run_graph(g, data)[0]
    # probabilities (scale 1/256, zp -128) sum to ~1.0 per row; per-element
    # rounding and the int8 cap (a dominant element saturates at 255/256)
    # allow small deviation
    sums = (out.astype(np.int32) - SOFTMAX_OUT_ZP).sum(axis=-1)
    assert ((sums >= 248) & (sums <= 264)).all(), sums
    # monotone: higher score -> no smaller probability
    row = data[0].astype(np.int32)
    p = out[0].astype(np.int32)
    order = np.argsort(row)
    assert (np.diff(p[order]) >= 0).all()
    # matches float softmax within quantization error
    ref = np.exp(0.08 * (row - row.max()))
    ref = ref / ref.sum()
    got = (p - SOFTMAX_OUT_ZP) / 256.0
    assert np.abs(got - ref).max() < 0.02


def test_qnn_softmax_bitexact_backends(rng):
    b = GraphBuilder()
    x = b.var("x", (2, 3, 8, 8), "int8")
    s = b.call("qnn.softmax", x, input_scale=0.1, axis=-1)
    g = infer_types(b.build(s))
    data = rng.integers(-128, 128, (2, 3, 8, 8), dtype=np.int64).astype(np.int8)
    np.testing.assert_array_equal(run_graph(g, data)[0], JaxExecutor(g).run(data)[0])


def test_exp_table_frozen():
    t = softmax_exp_table(0.1)
    assert t[0] == 32768 and t.dtype == np.int32
    assert (np.diff(t) <= 0).all()


def test_build_lut_gelu():
    from tachikoma_tpu.ir.graph import Node
    from tachikoma_tpu.ir.registry import get_op

    node = Node("g", "nn.gelu", ("x",), {})
    fn = get_op("nn.gelu").np_impl
    table = build_lut(lambda x: fn(x, node=node), 0.05, 0, 0.05, 0)
    assert table.shape == (256,)
    # gelu(0) == 0; gelu(large positive) ~ identity
    assert table[128] == 0
    assert table[255] == 127


def test_bert_int8_structure(qbert):
    g, qg, x = qbert
    ops = {n.op for n in qg.nodes}
    assert "qnn.softmax" in ops          # deterministic softmax-free path
    assert "qnn.lut" in ops              # gelu/tanh as LUT
    assert "qnn.batch_matmul" in ops     # int8 attention matmuls
    assert "nn.softmax" not in ops


def test_bert_int8_accuracy(qbert):
    g, qg, x = qbert
    fout = run_graph(g, x)[0]
    qout = run_graph(qg, x)[0]
    assert np.corrcoef(fout.ravel(), qout.ravel())[0, 1] > 0.99


def test_bert_int8_dualrun_bitexact(qbert):
    g, qg, x = qbert
    int_nodes = [
        n.name for n in qg.nodes
        if n.dtype in ("int8", "int32") and not n.is_const and not n.is_var
    ]
    assert len(int_nodes) > 50
    rec = {}
    run_graph(qg, x, intercept=lambda nm, op, i, o: rec.__setitem__(nm, o))
    outs = JaxExecutor(qg, capture=int_nodes).run(x)
    for nm, got in zip(int_nodes, outs):
        np.testing.assert_array_equal(rec[nm], got, err_msg=nm)


def test_bert_trace_roundtrip(qbert):
    from tachikoma_tpu.trace.emitter import emit_trace, verify_trace

    g, qg, x = qbert
    blob = emit_trace(qg, x, backend="oracle")
    res = verify_trace(blob, qg)
    assert res["verified"] == res["records"], res["mismatches"][:3]


@pytest.mark.slow
def test_vit_tiny_int8():
    g = vit(batch_size=1, image_size=32, patch=8, hidden=64, layers=2, heads=4,
            ffn_dim=128, num_classes=10)
    rng = np.random.default_rng(0)
    data = [rng.standard_normal((1, 32, 32, 3)).astype(np.float32) for _ in range(2)]
    qg = quantize(g, data, TRANSFORMER_INT8)
    fout = run_graph(g, data[0])[0]
    qout = run_graph(qg, data[0])[0]
    assert np.corrcoef(fout.ravel(), qout.ravel())[0, 1] > 0.98
