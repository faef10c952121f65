"""to_mixed_precision (TPU AMP): MXU ops compute in bf16 with fp32
accumulation; numerics stay within bf16 rounding of the fp32 graph;
integer graphs are untouched."""

import numpy as np

from tachikoma_tpu import GraphBuilder, infer_types, run_graph
from tachikoma_tpu.ir.transforms import to_mixed_precision
from tachikoma_tpu.runtime.executor import JaxExecutor


def small_cnn(rng):
    b = GraphBuilder()
    x = b.var("x", (2, 8, 8, 3), "float32")
    w = b.const(rng.standard_normal((3, 3, 3, 16)).astype(np.float32) * 0.2,
                "w")
    c = b.call("nn.conv2d", x, w, padding=(1, 1, 1, 1), name="conv")
    r = b.call("nn.relu", c)
    f = b.call("nn.batch_flatten", r)
    w2 = b.const(rng.standard_normal((8 * 8 * 16, 10)).astype(np.float32)
                 * 0.05, "w2")
    d = b.call("nn.dense", f, w2, name="fc")
    return infer_types(b.build(d))


def test_amp_rewrites_mxu_ops(rng):
    g = small_cnn(rng)
    amp = to_mixed_precision(g)
    conv = amp["conv"]
    fc = amp["fc"]
    assert conv.attrs["out_dtype"] == "float32"
    assert fc.attrs["out_dtype"] == "float32"
    # weights cast at compile time, activations via cast nodes
    assert str(amp.params[conv.inputs[1]].dtype) == "bfloat16"
    assert str(amp.params[fc.inputs[1]].dtype) == "bfloat16"
    assert amp[conv.inputs[0]].op == "cast"
    assert amp[conv.inputs[0]].dtype == "bfloat16"
    # output type unchanged
    assert amp["fc"].dtype == "float32"


def test_amp_numerics_close(rng):
    g = small_cnn(rng)
    amp = to_mixed_precision(g)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    want = run_graph(g, {"x": x})[0]
    got = run_graph(amp, {"x": x})[0]
    assert got.dtype == np.float32
    # bf16 has ~3 decimal digits; fp32 accumulation keeps the error at
    # input-rounding level
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # XLA path agrees with the oracle
    jx = JaxExecutor(amp).run({"x": x})[0]
    np.testing.assert_allclose(np.asarray(jx), got, rtol=2e-2, atol=2e-2)


def test_amp_skips_integer_graphs(rng):
    b = GraphBuilder()
    x = b.var("x", (2, 32), "int8")
    w = b.const(rng.integers(-127, 127, (32, 8)).astype(np.int8), "w")
    d = b.call("nn.dense", x, w, out_dtype="int32", name="qd")
    g = infer_types(b.build(d))
    amp = to_mixed_precision(g)
    assert amp["qd"].attrs["out_dtype"] == "int32"
    assert str(amp.params["w"].dtype) == "int8"
    xi = rng.integers(-127, 127, (2, 32)).astype(np.int8)
    a = run_graph(g, {"x": xi})[0]
    c = run_graph(amp, {"x": xi})[0]
    assert (a == c).all()


def test_amp_batch_matmul(rng):
    b = GraphBuilder()
    x = b.var("x", (3, 4, 8), "float32")
    y = b.var("y", (3, 8, 5), "float32")
    mm = b.call("nn.batch_matmul", x, y, name="bmm")
    g = infer_types(b.build(mm))
    amp = to_mixed_precision(g)
    assert amp[amp["bmm"].inputs[0]].dtype == "bfloat16"
    xa = rng.standard_normal((3, 4, 8)).astype(np.float32)
    ya = rng.standard_normal((3, 8, 5)).astype(np.float32)
    want = run_graph(g, {"x": xa, "y": ya})[0]
    got = run_graph(amp, {"x": xa, "y": ya})[0]
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
