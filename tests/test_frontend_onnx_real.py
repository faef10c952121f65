"""Real-artifact ONNX import: a model file produced by the real ONNX
exporter (mnist-8.onnx, the classic ONNX-zoo MNIST CNN shipped as test data
in the reference tree) decoded by the in-tree wire codec, executed, and
quantized end-to-end against real digit images."""

import os

import numpy as np
import pytest

from tachikoma_tpu import run_graph
from tachikoma_tpu.frontend.onnx import from_onnx
from tachikoma_tpu.quantize.quantizer import quantize
from tachikoma_tpu.runtime.executor import run_graph_jax

_DIR = "/root/reference/tests/micro/testdata/mnist"
_MODEL = os.path.join(_DIR, "mnist-8.onnx")

pytestmark = pytest.mark.skipif(
    not os.path.exists(_MODEL), reason="reference mnist-8.onnx not available")


def _digit(n: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(os.path.join(_DIR, f"digit-{n}.jpg")).convert("L")
    a = np.asarray(img).astype(np.float32) / 255.0
    return a.reshape(1, 1, 28, 28)


@pytest.fixture(scope="module")
def mnist_graph():
    with open(_MODEL, "rb") as f:
        return from_onnx(f.read())


def test_real_onnx_imports_and_classifies(mnist_graph):
    g = mnist_graph
    assert {"nn.conv2d", "nn.max_pool2d", "nn.dense"} <= {n.op for n in g.nodes}
    for d in (2, 9):
        out = run_graph(g, [_digit(d)])[0]
        assert out.shape == (1, 10)
        assert int(np.argmax(out)) == d


def test_real_onnx_quantizes_bit_exact(mnist_graph):
    data = [_digit(2), _digit(9)]
    qg = quantize(mnist_graph, data)
    assert "qnn.conv2d" in {n.op for n in qg.nodes}
    for d in (2, 9):
        ref = run_graph(qg, [_digit(d)])[0]
        got = run_graph_jax(qg, [_digit(d)])[0]
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
        assert int(np.argmax(ref)) == d
