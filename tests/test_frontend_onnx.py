"""ONNX frontend tests — wire-format codec roundtrip + model import parity.

Models are synthesized with the in-tree encoder (the environment has no onnx
package), exercising the same decode path a real .onnx file takes."""

import numpy as np
import pytest

from tachikoma_tpu import run_graph
from tachikoma_tpu.frontend.onnx import from_onnx
from tachikoma_tpu.frontend.onnx_proto import (
    decode,
    encode,
    np_to_tensor,
    tensor_to_np,
)


def make_model(nodes, inputs, outputs, initializers):
    """Assemble a ModelProto dict and round-trip it through wire encoding."""
    def vi(name, shape, elem=1):
        return {
            "name": name,
            "type": {"tensor_type": {
                "elem_type": elem,
                "shape": {"dim": [{"dim_value": s} for s in shape]},
            }},
        }

    model = {
        "ir_version": 8,
        "producer_name": "tachikoma_tpu.test",
        "opset_import": [{"domain": "", "version": 17}],
        "graph": {
            "name": "g",
            "node": nodes,
            "initializer": [np_to_tensor(k, v) for k, v in initializers.items()],
            "input": [vi(n, s) for n, s in inputs.items()],
            "output": [vi(n, s) for n, s in outputs.items()],
        },
    }
    blob = encode(model, "ModelProto")
    return decode(blob, "ModelProto")


def node(op, ins, outs, **attrs):
    alist = []
    for k, v in attrs.items():
        a = {"name": k}
        if isinstance(v, float):
            a["f"] = v
            a["type"] = 1
        elif isinstance(v, int):
            a["i"] = v
            a["type"] = 2
        elif isinstance(v, str):
            a["s"] = v.encode()
            a["type"] = 3
        elif isinstance(v, (list, tuple)) and all(isinstance(x, int) for x in v):
            a["ints"] = list(v)
            a["type"] = 7
        elif isinstance(v, np.ndarray):
            a["t"] = np_to_tensor("", v)
            a["type"] = 4
        else:
            raise TypeError(f"{k}={v!r}")
        alist.append(a)
    return {"op_type": op, "input": list(ins), "output": list(outs), "attribute": alist}


def test_codec_roundtrip(rng):
    arr = rng.standard_normal((3, 4)).astype(np.float32)
    t = np_to_tensor("w", arr)
    blob = encode(t, "TensorProto")
    back = tensor_to_np(decode(blob, "TensorProto"))
    np.testing.assert_array_equal(arr, back)


def test_cnn_import(rng):
    w = rng.standard_normal((8, 3, 3, 3)).astype(np.float32) * 0.2  # OIHW
    bias = rng.standard_normal(8).astype(np.float32)
    fc = rng.standard_normal((8 * 4 * 4, 10)).astype(np.float32) * 0.1
    model = make_model(
        nodes=[
            node("Conv", ["x", "w", "b"], ["c"], kernel_shape=[3, 3],
                 pads=[1, 1, 1, 1], strides=[2, 2]),
            node("Relu", ["c"], ["r"]),
            node("Flatten", ["r"], ["f"], axis=1),
            node("MatMul", ["f", "fc"], ["mm"]),
            node("Softmax", ["mm"], ["y"], axis=-1),
        ],
        inputs={"x": (2, 3, 8, 8)},
        outputs={"y": (2, 10)},
        initializers={"w": w, "b": bias, "fc": fc},
    )
    g = from_onnx(model)
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    got = run_graph(g, {"x": x})[0]
    # torch reference
    torch = pytest.importorskip("torch")
    tx = torch.from_numpy(x)
    c = torch.nn.functional.conv2d(tx, torch.from_numpy(w), torch.from_numpy(bias),
                                   stride=2, padding=1)
    want = torch.softmax(torch.relu(c).flatten(1) @ torch.from_numpy(fc), -1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gemm_bn_pool(rng):
    w = rng.standard_normal((4, 2, 3, 3)).astype(np.float32)
    gamma = np.abs(rng.standard_normal(4)).astype(np.float32) + 0.5
    beta = rng.standard_normal(4).astype(np.float32)
    mean = rng.standard_normal(4).astype(np.float32)
    var = np.abs(rng.standard_normal(4)).astype(np.float32) + 0.5
    gw = rng.standard_normal((5, 4)).astype(np.float32)  # Gemm transB: (out, in)
    gb = rng.standard_normal(5).astype(np.float32)
    model = make_model(
        nodes=[
            node("Conv", ["x", "w"], ["c"], kernel_shape=[3, 3], pads=[1, 1, 1, 1]),
            node("BatchNormalization", ["c", "gamma", "beta", "mean", "var"], ["bn"],
                 epsilon=1e-5),
            node("GlobalAveragePool", ["bn"], ["gap"]),
            node("Flatten", ["gap"], ["fl"], axis=1),
            node("Gemm", ["fl", "gw", "gb"], ["y"], transB=1),
        ],
        inputs={"x": (1, 2, 6, 6)},
        outputs={"y": (1, 5)},
        initializers={"w": w, "gamma": gamma, "beta": beta, "mean": mean,
                      "var": var, "gw": gw, "gb": gb},
    )
    g = from_onnx(model)
    x = rng.standard_normal((1, 2, 6, 6)).astype(np.float32)
    got = run_graph(g, {"x": x})[0]
    torch = pytest.importorskip("torch")
    tx = torch.from_numpy(x)
    c = torch.nn.functional.conv2d(tx, torch.from_numpy(w), padding=1)
    bn = torch.nn.functional.batch_norm(c, torch.from_numpy(mean), torch.from_numpy(var),
                                        torch.from_numpy(gamma), torch.from_numpy(beta))
    gap = bn.mean(dim=(2, 3))
    want = (gap @ torch.from_numpy(gw).T + torch.from_numpy(gb)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dynamic_reshape_idiom_folds(rng):
    """Shape -> Gather -> Unsqueeze -> Concat -> Reshape folds statically."""
    model = make_model(
        nodes=[
            node("Shape", ["x"], ["sh"]),
            node("Gather", ["sh", "idx0"], ["d0"], axis=0),
            node("Unsqueeze", ["d0"], ["d0u"], axes=[0]),
            node("Concat", ["d0u", "minus1"], ["target"], axis=0),
            node("Reshape", ["x", "target"], ["y"]),
        ],
        inputs={"x": (2, 3, 4)},
        outputs={"y": (2, 12)},
        initializers={"idx0": np.array(0, dtype=np.int64),
                      "minus1": np.array([-1], dtype=np.int64)},
    )
    g = from_onnx(model)
    assert not any(n.op == "take" for n in g.nodes), "shape ops must fold"
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    np.testing.assert_array_equal(run_graph(g, {"x": x})[0], x.reshape(2, 12))


def test_residual_add_mixed_layout(rng):
    w = rng.standard_normal((4, 4, 3, 3)).astype(np.float32) * 0.2
    model = make_model(
        nodes=[
            node("Conv", ["x", "w"], ["c"], kernel_shape=[3, 3], pads=[1, 1, 1, 1]),
            node("Add", ["c", "x"], ["y"]),
        ],
        inputs={"x": (1, 4, 6, 6)},
        outputs={"y": (1, 4, 6, 6)},
        initializers={"w": w},
    )
    g = from_onnx(model)
    x = rng.standard_normal((1, 4, 6, 6)).astype(np.float32)
    got = run_graph(g, {"x": x})[0]
    torch = pytest.importorskip("torch")
    want = (torch.nn.functional.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding=1)
            + torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_import_then_quantize(rng):
    w = rng.standard_normal((8, 3, 3, 3)).astype(np.float32) * 0.2
    model = make_model(
        nodes=[
            node("Conv", ["x", "w"], ["c"], kernel_shape=[3, 3], pads=[1, 1, 1, 1]),
            node("Relu", ["c"], ["y"]),
        ],
        inputs={"x": (1, 3, 8, 8)},
        outputs={"y": (1, 8, 8, 8)},
        initializers={"w": w},
    )
    g = from_onnx(model)
    from tachikoma_tpu.quantize.quantizer import quantize

    data = [rng.standard_normal((1, 3, 8, 8)).astype(np.float32) for _ in range(2)]
    qg = quantize(g, data)
    assert any(n.op == "qnn.conv2d" for n in qg.nodes)
    fout = run_graph(g, data[0])[0]
    qout = run_graph(qg, data[0])[0]
    assert np.corrcoef(fout.ravel(), qout.ravel())[0, 1] > 0.99
