"""MXNet-exported-model ingestion via the ONNX route (PARITY.md §2.6).

The reference ingests MXNet/Gluon natively (`python/tvm/relay/frontend/
mxnet.py`, mrt's `python/tvm/mrt/gluon.py`); this framework's stated policy
is "export to ONNX, import that".  tests/fixtures/mxnet_lenet.onnx is an
artifact serialized exactly the way `mxnet.contrib.onnx.mx2onnx` lays out a
Gluon classifier (producer "mxnet", opset 12, "data" input, Gluon parameter
naming, FullyConnected as Flatten+Gemm(transB=1), Pooling as MaxPool,
BatchNorm with spatial/momentum attrs) — built by
scripts/make_mxnet_fixture.py with the in-tree wire codec since mxnet itself
cannot be installed here.  Expected outputs come from an independent numpy
forward pass, not from the importer under test."""

import os

import numpy as np

from tachikoma_tpu import run_graph
from tachikoma_tpu.frontend.onnx import from_onnx
from tachikoma_tpu.quantize.quantizer import quantize
from tachikoma_tpu.runtime.executor import run_graph_jax

_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _load():
    with open(os.path.join(_DIR, "mxnet_lenet.onnx"), "rb") as f:
        g = from_onnx(f.read())
    io = np.load(os.path.join(_DIR, "mxnet_lenet_io.npz"))
    return g, io["x"], io["expected"]


def test_mxnet_export_imports_and_matches_numpy():
    g, x, expected = _load()
    ops = {n.op for n in g.nodes}
    assert {"nn.conv2d", "nn.max_pool2d", "nn.dense"} <= ops
    out = run_graph(g, [x])[0]
    assert out.shape == expected.shape
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_mxnet_export_quantizes_bit_exact():
    g, x, expected = _load()
    qg = quantize(g, [x])
    assert "qnn.conv2d" in {n.op for n in qg.nodes}
    ref = run_graph(qg, [x])[0]
    got = run_graph_jax(qg, [x])[0]
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    # int8 classifier agrees with the float forward on every sample
    assert (np.argmax(ref, axis=1) == np.argmax(expected, axis=1)).all()
