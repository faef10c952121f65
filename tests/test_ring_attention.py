"""Ring attention (sequence parallel) must match the single-device
qnn.attention op bit-for-bit on every ring size."""

import numpy as np
import pytest

from tachikoma_tpu import GraphBuilder, infer_types, run_graph
from tachikoma_tpu.parallel.mesh import simple_mesh
from tachikoma_tpu.parallel.ring_attention import ring_attention_int8
from tachikoma_tpu.runtime.executor import JaxExecutor


def reference(q, k, v, scores_scale, v_scale, out_scale):
    b = GraphBuilder()
    qn = b.var("q", q.shape, "int8")
    kn = b.var("k", k.shape, "int8")
    vn = b.var("v", v.shape, "int8")
    out = b.call(
        "qnn.attention", qn, kn, vn,
        scores_scale=scores_scale, v_scale=v_scale, output_scale=out_scale,
    )
    g = infer_types(b.build(out))
    return g


@pytest.fixture(scope="module")
def qkv(rng=None):
    rng = np.random.default_rng(0)
    B, H, S, D = 2, 4, 64, 32
    mk = lambda: rng.integers(-128, 128, (B, H, S, D)).astype(np.int8)
    return mk(), mk(), mk()


SCALES = dict(scores_scale=0.02, v_scale=0.1, out_scale=0.12)


def test_qnn_attention_dualrun(qkv):
    q, k, v = qkv
    g = reference(q, k, v, **SCALES)
    oracle = run_graph(g, {"q": q, "k": k, "v": v})[0]
    jx = JaxExecutor(g).run({"q": q, "k": k, "v": v})[0]
    np.testing.assert_array_equal(oracle, jx)
    assert oracle.dtype == np.int8


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_ring_matches_single_device(qkv, sp):
    q, k, v = qkv
    g = reference(q, k, v, **SCALES)
    want = run_graph(g, {"q": q, "k": k, "v": v})[0]
    mesh = simple_mesh({"sp": sp})
    got = np.asarray(
        ring_attention_int8(
            q, k, v, mesh,
            scores_scale=SCALES["scores_scale"], v_scale=SCALES["v_scale"],
            output_scale=SCALES["out_scale"], axis="sp",
        )
    )
    np.testing.assert_array_equal(got, want)


def test_ring_deterministic_across_ring_sizes(qkv):
    q, k, v = qkv
    outs = []
    for sp in (2, 8):
        mesh = simple_mesh({"sp": sp})
        outs.append(np.asarray(ring_attention_int8(
            q, k, v, mesh,
            scores_scale=SCALES["scores_scale"], v_scale=SCALES["v_scale"],
            output_scale=SCALES["out_scale"],
        )))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_attention_matches_float_approximately(qkv):
    """Sanity: the integer attention approximates float attention."""
    q, k, v = qkv
    g = reference(q, k, v, **SCALES)
    got = run_graph(g, {"q": q, "k": k, "v": v})[0].astype(np.float32) * SCALES["out_scale"]
    qs = q.astype(np.float64)
    scores = qs @ k.astype(np.float64).swapaxes(-1, -2) * SCALES["scores_scale"]
    w = np.exp(scores - scores.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    want = (w @ (v.astype(np.float64) * SCALES["v_scale"]))
    err = np.abs(got - want).max()
    assert err < 0.2, err
