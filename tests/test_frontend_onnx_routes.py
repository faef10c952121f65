"""Route-through-ONNX ingestion for paddle / oneflow / caffe / coreml /
darknet (PARITY.md §2.6; the reference's native frontends at
/root/reference/python/tvm/relay/frontend/{paddlepaddle,oneflow,caffe,
coreml,darknet}.py).

Fixtures are artifacts serialized exactly the way each framework's
standard ONNX exporter lays out a model (producer tag, parameter naming,
op/attr lowering — see scripts/make_onnx_route_fixtures.py), with expected
outputs from an INDEPENDENT numpy forward pass.  Each must import, run on
both backends, and quantize."""

import os

import numpy as np
import pytest

from tachikoma_tpu import run_graph
from tachikoma_tpu.frontend.onnx import from_onnx
from tachikoma_tpu.quantize.quantizer import quantize
from tachikoma_tpu.runtime.executor import run_graph_jax

_DIR = os.path.join(os.path.dirname(__file__), "fixtures")

FRAMEWORKS = ["paddle", "oneflow", "caffe", "coreml", "darknet"]


def _load(fw):
    with open(os.path.join(_DIR, f"{fw}_route.onnx"), "rb") as f:
        g = from_onnx(f.read())
    io = np.load(os.path.join(_DIR, f"{fw}_route_io.npz"))
    return g, io["x"], io["expected"]


@pytest.mark.parametrize("fw", FRAMEWORKS)
def test_route_imports_and_matches_numpy(fw):
    g, x, expected = _load(fw)
    out = run_graph(g, [x])[0]
    assert out.shape == expected.shape
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)
    jout = np.asarray(run_graph_jax(g, [x])[0])
    np.testing.assert_allclose(jout, expected, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("fw", FRAMEWORKS)
def test_route_quantizes_bit_exact(fw):
    g, x, expected = _load(fw)
    qg = quantize(g, [x])
    assert any(n.op.startswith(("qnn.", "tk.")) for n in qg.nodes)
    ref = run_graph(qg, [x])
    got = run_graph_jax(qg, [x])
    for a, c in zip(ref, got):
        a, c = np.asarray(a), np.asarray(c)
        if a.dtype.kind in "iu":
            np.testing.assert_array_equal(a, c)


def test_route_exporter_conventions_preserved():
    """The fixtures really carry each exporter's fingerprints (guards the
    fixture generator against drifting into a generic ONNX)."""
    from tachikoma_tpu.frontend.onnx_proto import load_model

    fingerprints = {
        "paddle": ("PaddlePaddle", "conv2d_0.w_0"),
        "oneflow": ("oneflow-onnx", "model.conv1.weight"),
        "caffe": ("caffe2onnx", "conv1_w"),
        "coreml": ("OnnxMLTools", "convolution_W"),
        "darknet": ("darknet2onnx", "conv_0_weights"),
    }
    for fw, (producer, pname) in fingerprints.items():
        with open(os.path.join(_DIR, f"{fw}_route.onnx"), "rb") as f:
            m = load_model(f.read())
        assert m["producer_name"] == producer, fw
        inits = {t["name"] for t in m["graph"]["initializer"]}
        assert pname in inits, (fw, sorted(inits)[:5])
    # caffe's signature ops made it through: LRN + ceil-mode pooling
    with open(os.path.join(_DIR, "caffe_route.onnx"), "rb") as f:
        m = load_model(f.read())
    ops = [n["op_type"] for n in m["graph"]["node"]]
    assert "LRN" in ops
    # darknet: opset-9 Upsample with a scales INPUT + bias-free convs
    with open(os.path.join(_DIR, "darknet_route.onnx"), "rb") as f:
        m = load_model(f.read())
    ups = [n for n in m["graph"]["node"] if n["op_type"] == "Upsample"]
    assert ups and len(ups[0]["input"]) == 2
