"""TFLite frontend: real exporter-produced int8 fixtures.

Fixtures in tests/fixtures/ were produced by the actual TensorFlow
TFLiteConverter (full-integer PTQ) via scripts/make_tflite_fixtures.py, and
the goldens (*_io.npz) by the actual TFLite interpreter — the frontend test
pattern of the reference (run the source framework as golden,
`/root/reference/tests/python/frontend/tflite/test_forward.py`), which
compares quantized outputs within one quantum (requantize rounding between
TFLite's two-step gemmlowp and the reference's single-step fixed point can
differ by 1).

Bit-exactness within OUR stack stays `==`: oracle == XLA == trace for the
imported graph.
"""

import os

import numpy as np
import pytest

from tachikoma_tpu import run_graph
from tachikoma_tpu.frontend.tflite import from_tflite
from tachikoma_tpu.runtime.executor import run_graph_jax

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name, **kw):
    path = os.path.join(FIX, f"{name}.tflite")
    io = np.load(os.path.join(FIX, f"{name}_io.npz"))
    g = from_tflite(path, **kw)
    return g, io


@pytest.mark.parametrize("name", ["small_cnn_int8", "mobilenet_v2_int8"])
def test_import_matches_tflite_interpreter(name):
    """Faithful mode (integer_lut=False = the reference's dequant/quant
    softmax islands, tflite.py:832): one-quantum interpreter parity."""
    g, io = _load(name, integer_lut=False)
    x, want = io["x"], io["y"]
    got = run_graph(g, x)[0]
    assert got.dtype == want.dtype and got.shape == want.shape
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    # reference-frontend tolerance: one quantum (rounding-mode divergence)
    assert diff.max() <= 1, f"max diff {diff.max()} vs TFLite interpreter"
    # and overwhelmingly exact
    assert (diff == 0).mean() > 0.9


@pytest.mark.parametrize("name", ["small_cnn_int8", "mobilenet_v2_int8"])
def test_integer_lut_mode_classifies_identically(name):
    """Default mode replaces the softmax island with the exact integer LUT
    softmax (deterministic traces): logits path stays one-quantum-parity
    and the classification (top-1 over the softmax) is unchanged."""
    g, io = _load(name)
    x, want = io["x"], io["y"]
    got = run_graph(g, x)[0]
    assert np.argmax(got) == np.argmax(want), "top-1 changed"
    # probabilities from the pinned integer softmax approximate TFLite's
    # own (different) fixed-point softmax within a few quanta
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 32, f"max diff {diff.max()}"


@pytest.mark.parametrize("name", ["small_cnn_int8"])
def test_import_oracle_equals_xla(name):
    g, io = _load(name)
    x = io["x"]
    o = run_graph(g, x)
    j = run_graph_jax(g, x)
    for a, b in zip(o, j):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype
        assert (a == b).all(), "oracle vs XLA mismatch on imported graph"


def test_imported_graph_traces_bit_exactly():
    from tachikoma_tpu.trace.emitter import emit_trace, verify_trace

    g, io = _load("small_cnn_int8")
    x = io["x"]
    blob_np = emit_trace(g, x, backend="numpy")
    blob_jx = emit_trace(g, x, backend="jax")
    assert blob_np == blob_jx
    assert verify_trace(blob_np, g)["mismatches"] == []


def test_imported_graph_fuses_to_pallas_ops():
    """The emitted qnn patterns must flow into the tk.*_rq fused kernels."""
    from tachikoma_tpu.runtime.fuse import fuse_qnn

    g, io = _load("mobilenet_v2_int8")
    fg = fuse_qnn(g)
    ops = [n.op for n in fg.nodes if not (n.is_var or n.is_const)]
    assert any(o in ("tk.conv2d_rq", "tk.conv2d_chain") for o in ops)
    assert "qnn.requantize" not in [
        fg[n.name].op for n in fg.nodes
        if n.op == "tk.conv2d_rq"]  # requantize folded into kernels
    x = io["x"]
    a = run_graph(g, x)[0]
    b = run_graph(fg, x)[0]
    assert (np.asarray(a) == np.asarray(b)).all(), "fusion changed values"


def test_mobilenet_per_channel_weights():
    """TFLite int8 conv weights are per-channel symmetric: the importer must
    carry the scale vector into the requantize axis=3."""
    g, _ = _load("mobilenet_v2_int8")
    rq = [n for n in g.nodes if n.op == "qnn.requantize"
          and np.ndim(n.attrs["input_scale"]) > 0]
    assert rq, "no per-channel requantize found"


def test_in_tree_reader_matches_tf_schema():
    """Pin the hand-written flatbuffer reader against TF's generated
    parser on a real file (skipped when TF is unavailable)."""
    tf = pytest.importorskip("tensorflow")
    from tensorflow.lite.python import schema_py_generated as s

    from tachikoma_tpu.frontend import tflite_fb as fb

    buf = open(os.path.join(FIX, "small_cnn_int8.tflite"), "rb").read()
    ours = fb.Model(fb.root(memoryview(buf)).buf,
                    fb.root(memoryview(buf)).pos)
    theirs = s.Model.GetRootAsModel(buf, 0)

    assert ours.version() == theirs.Version()
    assert len(ours.operator_codes()) == theirs.OperatorCodesLength()
    for i, oc in enumerate(ours.operator_codes()):
        toc = theirs.OperatorCodes(i)
        assert oc.builtin_code() == max(toc.DeprecatedBuiltinCode(),
                                        toc.BuiltinCode())
    sg, tsg = ours.subgraphs()[0], theirs.Subgraphs(0)
    assert len(sg.tensors()) == tsg.TensorsLength()
    np.testing.assert_array_equal(sg.inputs(), tsg.InputsAsNumpy())
    np.testing.assert_array_equal(sg.outputs(), tsg.OutputsAsNumpy())
    for i, t in enumerate(sg.tensors()):
        tt = tsg.Tensors(i)
        assert t.type() == tt.Type()
        assert t.buffer() == tt.Buffer()
        assert t.name() == tt.Name().decode()
        np.testing.assert_array_equal(t.shape(), tt.ShapeAsNumpy())
        q, tq = t.quantization(), tt.Quantization()
        if tq is not None and tq.ScaleLength():
            np.testing.assert_array_equal(q.scale(), tq.ScaleAsNumpy())
            np.testing.assert_array_equal(q.zero_point(),
                                          tq.ZeroPointAsNumpy())
            assert q.quantized_dimension() == tq.QuantizedDimension()
    for i, op in enumerate(sg.operators()):
        top = tsg.Operators(i)
        assert op.opcode_index() == top.OpcodeIndex()
        np.testing.assert_array_equal(op.inputs(), top.InputsAsNumpy())
        np.testing.assert_array_equal(op.outputs(), top.OutputsAsNumpy())
        assert op.builtin_options_type() == top.BuiltinOptionsType()


def test_16x8_mode_import():
    """TFLite 16x8 (int16 activations, int8 weights): imports with int64
    accumulators (reference convert_conv: out_dtype int64 for int16) and
    matches the real TFLite interpreter within one int16 output quantum."""
    g = from_tflite(os.path.join(FIX, "small_cnn_16x8.tflite"))
    dts = {n.dtype for n in g.nodes if n.dtype}
    assert "int16" in dts and "int64" in dts, dts
    io = np.load(os.path.join(FIX, "small_cnn_16x8_io.npz"))
    x, want = io["x"], io["y"]
    got = run_graph(g, x)[0]
    assert np.abs(got - want).max() <= 1.0 / (1 << 15) + 1e-9
    j = run_graph_jax(g, x)[0]
    np.testing.assert_allclose(got, j, rtol=1e-6, atol=1e-7)


def test_mobilenet_batch_statistical_parity():
    """16 random inputs through the genuine TFLite interpreter: faithful
    import matches within one quantum on EVERY logit, top-1 agrees on
    every sample."""
    g = from_tflite(os.path.join(FIX, "mobilenet_v2_int8.tflite"),
                    integer_lut=False)
    batch = np.load(os.path.join(FIX, "mobilenet_v2_int8_batch.npz"))
    xs, ys = batch["x"], batch["y"]
    agree = 0
    for i in range(xs.shape[0]):
        got = run_graph(g, xs[i:i + 1])[0]
        diff = np.abs(got.astype(np.int32) - ys[i:i + 1].astype(np.int32))
        assert diff.max() <= 1, f"sample {i}: max diff {diff.max()}"
        agree += int(np.argmax(got) == np.argmax(ys[i]))
    assert agree == xs.shape[0], f"top-1 agreement {agree}/16"
