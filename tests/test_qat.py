"""QAT: simulated_quantize ops + straight-through training + finalization.

Closes the round-2 gap "qnn.simulated_quantize exists in the reference
(src/relay/qnn/op/simulated_quantize.cc:63) but the repo's autodiff has no
fake-quant op to train through"."""

import numpy as np
import pytest

from tachikoma_tpu import GraphBuilder, infer_types, run_graph
from tachikoma_tpu.quantize.qat import qat_finalize, qat_prepare
from tachikoma_tpu.runtime.autodiff import value_and_grad_fn
from tachikoma_tpu.runtime.executor import run_graph_jax


def test_simulated_quantize_semantics(rng):
    x = rng.standard_normal((4, 8)).astype(np.float32) * 3
    b = GraphBuilder()
    v = b.var("x", x.shape, "float32")
    sq = b.call("qnn.simulated_quantize", v, scale=0.05, zero_point=3,
                out_dtype="int8")
    dq = b.call("qnn.simulated_dequantize", sq, scale=0.05, zero_point=3)
    g = infer_types(b.build([sq, dq]))
    o = run_graph(g, x)
    j = run_graph_jax(g, x)
    want_q = np.clip(np.rint(x / 0.05) + 3, -128, 127)
    np.testing.assert_array_equal(o[0], want_q.astype(np.float32))
    np.testing.assert_array_equal(o[0], j[0])
    np.testing.assert_allclose(o[1], (want_q - 3) * 0.05, rtol=1e-6)
    # fake-quant roundtrip == real quantize->dequantize pair bitwise
    b2 = GraphBuilder()
    v2 = b2.var("x", x.shape, "float32")
    q = b2.call("qnn.quantize", v2, scale=0.05, zero_point=3,
                out_dtype="int8")
    d = b2.call("qnn.dequantize", q, scale=0.05, zero_point=3)
    g2 = infer_types(b2.build(d))
    np.testing.assert_array_equal(run_graph(g2, x)[0], o[1])


def test_ste_gradient_mask():
    """Gradient of the fake-quant pair: ~1 inside range, 0 where clipped."""
    import jax
    import jax.numpy as jnp

    from tachikoma_tpu.ir.graph import Node
    from tachikoma_tpu.ir.registry import get_op

    sq = get_op("qnn.simulated_quantize").jax_impl
    dq = get_op("qnn.simulated_dequantize").jax_impl
    nsq = Node("s", "qnn.simulated_quantize", ("x",),
               {"scale": 0.1, "zero_point": 0, "out_dtype": "int8"})
    ndq = Node("d", "qnn.simulated_dequantize", ("s",),
               {"scale": 0.1, "zero_point": 0})

    def f(x):
        return dq(sq(x, node=nsq), node=ndq).sum()

    x = jnp.asarray([0.5, -0.3, 20.0, -20.0, 3.0])  # +-20 clip (range 12.7)
    gr = jax.grad(f)(x)
    np.testing.assert_allclose(gr, [1.0, 1.0, 0.0, 0.0, 1.0], atol=1e-6)


def _tiny_cnn(rng, with_loss=True):
    b = GraphBuilder()
    x = b.var("x", (4, 8, 8, 3), "float32")
    w1 = b.const(rng.standard_normal((3, 3, 3, 8)).astype(np.float32) * 0.3,
                 "w1")
    c = b.call("nn.conv2d", x, w1, padding=(1, 1, 1, 1), name="c1")
    c = b.call("nn.relu", c)
    c = b.call("nn.global_avg_pool2d", c)
    c = b.call("reshape", c, newshape=(4, 8))
    w2 = b.const(rng.standard_normal((8, 5)).astype(np.float32) * 0.3, "w2")
    d = b.call("nn.dense", c, w2, name="fc")
    if with_loss:
        d = b.call("mean", b.call("multiply", d, d))  # scalar
    return infer_types(b.build(d))


def test_qat_train_step_and_finalize(rng):
    seed = rng.bit_generator.state["state"]["state"]
    g = _tiny_cnn(np.random.default_rng(seed))
    g_logits = _tiny_cnn(np.random.default_rng(seed), with_loss=False)
    data = [rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
            for _ in range(2)]
    qat_g = qat_prepare(g, data)
    ops = [n.op for n in qat_g.nodes]
    assert ops.count("qnn.simulated_quantize") >= 4  # 2 acts + 2 weights
    # float semantics preserved modulo quantization noise
    base = run_graph(g, data[0])[0]
    fq = run_graph(qat_g, data[0])[0]
    assert abs(float(base) - float(fq)) < max(0.15 * abs(float(base)), 0.15)

    fn, params, frozen = value_and_grad_fn(qat_g)
    x = {"x": data[0]}
    loss0, grads = fn(params, x)
    assert np.isfinite(float(loss0))
    gnorms = {k: float(np.abs(v).sum()) for k, v in grads.items()}
    assert gnorms["w1"] > 0 and gnorms["w2"] > 0, gnorms
    # one SGD step through the fake-quant graph reduces the loss
    lr = 0.05
    stepped = {k: np.asarray(params[k]) - lr * np.asarray(grads[k])
               for k in grads}
    loss1, _ = fn({**params, **stepped}, x)
    assert float(loss1) < float(loss0)

    # finalize: integer graph of the trained weights traces bit-exactly
    from tachikoma_tpu.trace.emitter import emit_trace, verify_trace

    # integer deployment graph = LOGITS model (the float loss tail is a
    # training artifact; float reductions are not byte-stable across
    # backends and do not ship)
    qg = qat_finalize(g_logits, stepped, data)
    blob_np = emit_trace(qg, data[0], backend="numpy")
    blob_jx = emit_trace(qg, data[0], backend="jax")
    assert blob_np == blob_jx
    assert verify_trace(blob_np, qg)["mismatches"] == []
