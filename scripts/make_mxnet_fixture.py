"""Generate tests/fixtures/mxnet_lenet.onnx — an ONNX artifact laid out the
way MXNet's exporter (`mxnet.contrib.onnx.mx2onnx`, the reference's mrt
ingestion path `python/tvm/mrt/gluon.py` ultimately feeds `relay/frontend/
mxnet.py` or this ONNX route) serializes a Gluon classifier:

- producer_name "mxnet", opset 12, ir_version 7
- input named "data" (the MXNet convention)
- Gluon parameter naming: conv0_weight / conv0_bias, batchnorm0_gamma /
  _beta / _moving_mean / _moving_var, fullyconnected0_weight / _bias
- FullyConnected lowered as Flatten + Gemm(alpha=1, beta=1, transB=1),
  Activation->Relu, Pooling->MaxPool, BatchNorm->BatchNormalization with
  epsilon/momentum/spatial attributes — the exact op/attr shapes mx2onnx's
  _op_translations emit.

The environment has no mxnet package (nothing can be pip-installed), so the
fixture is constructed with the in-tree ONNX wire codec to byte-match the
exporter's conventions; the expected output in mxnet_lenet_io.npz comes from
an independent numpy forward pass written here (NOT from the importer under
test).  PARITY.md §2.6: MXNet models route through ONNX export.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tachikoma_tpu.frontend.onnx_proto import encode, np_to_tensor  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def vi(name, shape):
    return {
        "name": name,
        "type": {"tensor_type": {
            "elem_type": 1,
            "shape": {"dim": [{"dim_value": s} for s in shape]},
        }},
    }


def attr(k, v):
    a = {"name": k}
    if isinstance(v, float):
        a["f"] = v
        a["type"] = 1
    elif isinstance(v, int):
        a["i"] = v
        a["type"] = 2
    elif isinstance(v, (list, tuple)):
        a["ints"] = [int(x) for x in v]
        a["type"] = 7
    else:
        raise TypeError(v)
    return a


def node(op, name, ins, outs, **attrs):
    return {"op_type": op, "name": name, "input": list(ins),
            "output": list(outs),
            "attribute": [attr(k, v) for k, v in attrs.items()]}


def main():
    rng = np.random.default_rng(7)
    p = {
        "conv0_weight": rng.standard_normal((8, 1, 3, 3)).astype(np.float32) * 0.3,
        "conv0_bias": rng.standard_normal((8,)).astype(np.float32) * 0.1,
        "batchnorm0_gamma": (1.0 + 0.1 * rng.standard_normal((8,))).astype(np.float32),
        "batchnorm0_beta": (0.1 * rng.standard_normal((8,))).astype(np.float32),
        "batchnorm0_moving_mean": (0.05 * rng.standard_normal((8,))).astype(np.float32),
        "batchnorm0_moving_var": (1.0 + 0.1 * rng.random((8,))).astype(np.float32),
        "conv1_weight": rng.standard_normal((16, 8, 3, 3)).astype(np.float32) * 0.1,
        "conv1_bias": rng.standard_normal((16,)).astype(np.float32) * 0.1,
        "fullyconnected0_weight": rng.standard_normal((32, 16 * 7 * 7)).astype(np.float32) * 0.05,
        "fullyconnected0_bias": rng.standard_normal((32,)).astype(np.float32) * 0.1,
        "fullyconnected1_weight": rng.standard_normal((10, 32)).astype(np.float32) * 0.1,
        "fullyconnected1_bias": rng.standard_normal((10,)).astype(np.float32) * 0.1,
    }
    nodes = [
        node("Conv", "conv0", ["data", "conv0_weight", "conv0_bias"],
             ["conv0_output"], kernel_shape=[3, 3], strides=[1, 1],
             pads=[1, 1, 1, 1], dilations=[1, 1], group=1),
        node("BatchNormalization", "batchnorm0",
             ["conv0_output", "batchnorm0_gamma", "batchnorm0_beta",
              "batchnorm0_moving_mean", "batchnorm0_moving_var"],
             ["batchnorm0_output"], epsilon=1e-3, momentum=0.9, spatial=1),
        node("Relu", "relu0", ["batchnorm0_output"], ["relu0_output"]),
        node("MaxPool", "pool0", ["relu0_output"], ["pool0_output"],
             kernel_shape=[2, 2], strides=[2, 2], pads=[0, 0, 0, 0]),
        node("Conv", "conv1", ["pool0_output", "conv1_weight", "conv1_bias"],
             ["conv1_output"], kernel_shape=[3, 3], strides=[1, 1],
             pads=[1, 1, 1, 1], dilations=[1, 1], group=1),
        node("Relu", "relu1", ["conv1_output"], ["relu1_output"]),
        node("MaxPool", "pool1", ["relu1_output"], ["pool1_output"],
             kernel_shape=[2, 2], strides=[2, 2], pads=[0, 0, 0, 0]),
        node("Flatten", "flatten0", ["pool1_output"], ["flatten0_output"]),
        node("Gemm", "fullyconnected0",
             ["flatten0_output", "fullyconnected0_weight",
              "fullyconnected0_bias"], ["fullyconnected0_output"],
             alpha=1.0, beta=1.0, transA=0, transB=1),
        node("Relu", "relu2", ["fullyconnected0_output"], ["relu2_output"]),
        node("Gemm", "fullyconnected1",
             ["relu2_output", "fullyconnected1_weight",
              "fullyconnected1_bias"], ["fullyconnected1_output"],
             alpha=1.0, beta=1.0, transA=0, transB=1),
    ]
    model = {
        "ir_version": 7,
        "producer_name": "mxnet",
        "producer_version": "1.9.1",
        "opset_import": [{"domain": "", "version": 12}],
        "graph": {
            "name": "lenet",
            "node": nodes,
            "initializer": [np_to_tensor(k, v) for k, v in p.items()],
            "input": [vi("data", [4, 1, 28, 28])],
            "output": [vi("fullyconnected1_output", [4, 10])],
        },
    }
    blob = encode(model, "ModelProto")
    with open(os.path.join(OUT, "mxnet_lenet.onnx"), "wb") as f:
        f.write(blob)

    # independent numpy forward (float64 accumulation, cast at the end)
    def conv(x, w, b, pad):
        n, c, h, wd = x.shape
        o, _, kh, kw = w.shape
        xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
        out = np.zeros((n, o, h, wd), np.float64)
        for ki in range(kh):
            for kj in range(kw):
                patch = xp[:, :, ki:ki + h, kj:kj + wd]
                out += np.einsum("nchw,oc->nohw", patch, w[:, :, ki, kj],
                                 optimize=True)
        return out + b.reshape(1, -1, 1, 1)

    def maxpool2(x):
        n, c, h, w = x.shape
        return x.reshape(n, c, h // 2, 2, w // 2, 2).max(axis=(3, 5))

    x = rng.standard_normal((4, 1, 28, 28)).astype(np.float32)
    v = conv(x.astype(np.float64), p["conv0_weight"].astype(np.float64),
             p["conv0_bias"].astype(np.float64), 1)
    g, be = p["batchnorm0_gamma"], p["batchnorm0_beta"]
    mu, var = p["batchnorm0_moving_mean"], p["batchnorm0_moving_var"]
    v = (v - mu.reshape(1, -1, 1, 1)) / np.sqrt(
        var.reshape(1, -1, 1, 1) + 1e-3) * g.reshape(1, -1, 1, 1) \
        + be.reshape(1, -1, 1, 1)
    v = maxpool2(np.maximum(v, 0))
    v = conv(v, p["conv1_weight"].astype(np.float64),
             p["conv1_bias"].astype(np.float64), 1)
    v = maxpool2(np.maximum(v, 0))
    v = v.reshape(4, -1)
    v = np.maximum(v @ p["fullyconnected0_weight"].T.astype(np.float64)
                   + p["fullyconnected0_bias"], 0)
    v = v @ p["fullyconnected1_weight"].T.astype(np.float64) \
        + p["fullyconnected1_bias"]
    np.savez(os.path.join(OUT, "mxnet_lenet_io.npz"),
             x=x, expected=v.astype(np.float32))
    print("wrote mxnet_lenet.onnx +", v.shape)


if __name__ == "__main__":
    main()
