"""Dynamic-shape bucketing executor (the Relay VM analog): one compile per
bucket, padded execution matches exact-shape execution at every batch."""

import numpy as np

from tachikoma_tpu.ir.graph import GraphBuilder
from tachikoma_tpu.quantize.quantizer import quantize
from tachikoma_tpu.runtime.bucketed import BucketedExecutor
from tachikoma_tpu.runtime.executor import run_graph_jax


def _model(rng):
    b = GraphBuilder("dyn")
    x = b.var("x", (1, 8, 8, 4), "float32")
    w = b.const(rng.standard_normal((3, 3, 4, 8)).astype(np.float32) * 0.2)
    h = b.call("nn.conv2d", x, w, strides=(1, 1), padding=(1, 1, 1, 1))
    h = b.call("nn.relu", h)
    h = b.call("nn.global_avg_pool2d", h)
    h = b.call("nn.batch_flatten", h)
    w2 = b.const(rng.standard_normal((8, 5)).astype(np.float32) * 0.2)
    h = b.call("nn.dense", h, w2)
    return b.build([h])


def test_bucketed_matches_exact(rng):
    g = _model(rng)
    ex = BucketedExecutor(g, buckets=(2, 4, 8))
    for batch in (1, 2, 3, 4, 3, 7, 2):
        x = rng.standard_normal((batch, 8, 8, 4)).astype(np.float32)
        got = ex.run([x])[0]
        want = run_graph_jax(ex._graph_for(batch), [x])[0]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        assert got.shape[0] == batch
    # 7 batch sizes, only 3 distinct buckets compiled (2, 4, 8)
    assert ex.compiled_buckets == [2, 4, 8]


def test_bucketed_overflow_batch(rng):
    g = _model(rng)
    ex = BucketedExecutor(g, buckets=(2,))
    x = rng.standard_normal((5, 8, 8, 4)).astype(np.float32)
    out = ex.run([x])[0]
    assert out.shape[0] == 5
    assert ex.compiled_buckets == [5]


def test_bucketed_quantized_bitexact(rng):
    g = _model(rng)
    data = [rng.standard_normal((1, 8, 8, 4)).astype(np.float32)]
    qg = quantize(g, data)
    ex = BucketedExecutor(qg, buckets=(4,))
    x = rng.standard_normal((3, 8, 8, 4)).astype(np.float32)
    got = ex.run([x])[0]
    want = run_graph_jax(ex._graph_for(3), [x])[0]
    # integer interior: padded rows cannot perturb real rows
    np.testing.assert_array_equal(got, want)
