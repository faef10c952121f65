"""Generate tests/fixtures/<fw>_route.onnx for the five remaining
route-through-ONNX frameworks (PARITY.md §2.6): paddle, oneflow, caffe,
coreml, darknet.

The reference ingests each framework natively
(/root/reference/python/tvm/relay/frontend/{paddlepaddle,oneflow,caffe,
coreml,darknet}.py); this framework's stated policy is "export to ONNX,
import that" — demonstrated for MXNet in round 4 (make_mxnet_fixture.py)
and closed for the rest here.  None of these frameworks can be installed
in this environment, so each fixture is constructed with the in-tree ONNX
wire codec to match the op/attr lowering and parameter-naming conventions
of that framework's standard ONNX exporter:

  * paddle  — paddle2onnx: params `conv2d_0.w_0` / `batch_norm_0.w_0`
    style, fc as Flatten + MatMul((in,out) weight) + Add, exclusive-pad
    AveragePool (count_include_pad=0), input "inputs"
  * oneflow — oneflow-onnx: dotted module paths `model.conv1.weight`,
    fc as Flatten + MatMul + Add, opset 10
  * caffe   — caffe2onnx: layer-name params `conv1_w`/`conv1_b`, LRN
    (caffe's signature op), ceil-mode Pooling, InnerProduct as
    Gemm(transB=1), Softmax output named "prob"
  * coreml  — onnxmltools (CoreML -> ONNX): producer "OnnxMLTools",
    `convolution_W`-style initializers, input "image",
    GlobalAveragePool head
  * darknet — YOLO-style export: bias-free Conv + BatchNormalization +
    LeakyRelu(0.1) blocks, opset-9 Upsample (scales INPUT) + route Concat,
    1x1 detection head conv with bias

Expected outputs come from an INDEPENDENT numpy forward pass written here
(not from the importer under test).  Each fixture gets <fw>_route_io.npz
with {x, expected}.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tachikoma_tpu.frontend.onnx_proto import encode, np_to_tensor  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


# ---------------------------------------------------------------------------
# independent numpy reference ops (NCHW)
# ---------------------------------------------------------------------------

def ref_conv(x, w, b=None, stride=1, pad=0):
    n, c, h, wd = x.shape
    co, ci, kh, kw = w.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oh = (h + 2 * pad - kh) // stride + 1
    ow = (wd + 2 * pad - kw) // stride + 1
    out = np.zeros((n, co, oh, ow), np.float32)
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, :, i * stride:i * stride + kh,
                       j * stride:j * stride + kw]
            out[:, :, i, j] = np.einsum("nchw,ochw->no", patch, w)
    if b is not None:
        out += b.reshape(1, -1, 1, 1)
    return out.astype(np.float32)


def ref_bn(x, g, b, m, v, eps):
    return (g.reshape(1, -1, 1, 1) * (x - m.reshape(1, -1, 1, 1))
            / np.sqrt(v.reshape(1, -1, 1, 1) + eps)
            + b.reshape(1, -1, 1, 1)).astype(np.float32)


def ref_maxpool(x, k, stride, ceil=False):
    n, c, h, w = x.shape
    if ceil:
        oh = -(-(h - k) // stride) + 1
        ow = -(-(w - k) // stride) + 1
    else:
        oh = (h - k) // stride + 1
        ow = (w - k) // stride + 1
    out = np.full((n, c, oh, ow), -np.inf, np.float32)
    for i in range(oh):
        for j in range(ow):
            ys, xs = i * stride, j * stride
            out[:, :, i, j] = x[:, :, ys:min(ys + k, h),
                                xs:min(xs + k, w)].max((2, 3))
    return out


def ref_avgpool_excl(x, k, stride, pad):
    """count_include_pad=0 (paddle's exclusive pooling)."""
    n, c, h, w = x.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    cnt = np.pad(np.ones((h, w), np.float32),
                 ((pad, pad), (pad, pad)))
    oh = (h + 2 * pad - k) // stride + 1
    ow = (w + 2 * pad - k) // stride + 1
    out = np.zeros((n, c, oh, ow), np.float32)
    for i in range(oh):
        for j in range(ow):
            ys, xs = i * stride, j * stride
            s = xp[:, :, ys:ys + k, xs:xs + k].sum((2, 3))
            m = cnt[ys:ys + k, xs:xs + k].sum()
            out[:, :, i, j] = s / m
    return out


def ref_lrn(x, size, alpha, beta, bias):
    n, c, h, w = x.shape
    sq = x * x
    out = np.zeros_like(x)
    half = size // 2
    for ci in range(c):
        lo, hi = max(0, ci - half), min(c, ci + half + 1)
        s = sq[:, lo:hi].sum(1)
        out[:, ci] = x[:, ci] / np.power(bias + alpha * s / size, beta)
    return out.astype(np.float32)


def ref_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return (e / e.sum(axis=axis, keepdims=True)).astype(np.float32)


def ref_upsample2x(x):
    return x.repeat(2, axis=2).repeat(2, axis=3)


def leaky(x, a=0.1):
    return np.where(x >= 0, x, a * x).astype(np.float32)


# ---------------------------------------------------------------------------
# wire helpers (make_mxnet_fixture.py conventions)
# ---------------------------------------------------------------------------

def vi(name, shape):
    return {"name": name, "type": {"tensor_type": {
        "elem_type": 1,
        "shape": {"dim": [{"dim_value": s} for s in shape]}}}}


def attr(k, v):
    a = {"name": k}
    if isinstance(v, float):
        a["f"], a["type"] = v, 1
    elif isinstance(v, int):
        a["i"], a["type"] = v, 2
    elif isinstance(v, str):
        a["s"], a["type"] = v.encode(), 3
    elif isinstance(v, (list, tuple)):
        a["ints"], a["type"] = [int(x) for x in v], 7
    else:
        raise TypeError(v)
    return a


def node(op, name, ins, outs, **attrs):
    return {"op_type": op, "name": name, "input": list(ins),
            "output": list(outs),
            "attribute": [attr(k, v) for k, v in attrs.items()]}


def write_model(fw, producer, opset, nodes, params, in_name, in_shape,
                out_name, out_shape, x, expected, producer_version="1.0"):
    model = {
        "ir_version": 7,
        "producer_name": producer,
        "producer_version": producer_version,
        "opset_import": [{"domain": "", "version": opset}],
        "graph": {
            "name": f"{fw}_route",
            "node": nodes,
            "initializer": [np_to_tensor(k, v) for k, v in params.items()],
            "input": [vi(in_name, in_shape)],
            "output": [vi(out_name, out_shape)],
        },
    }
    path = os.path.join(OUT, f"{fw}_route.onnx")
    with open(path, "wb") as f:
        f.write(encode(model, "ModelProto"))
    np.savez(os.path.join(OUT, f"{fw}_route_io.npz"), x=x,
             expected=expected)
    print(f"wrote {path} ({os.path.getsize(path)} bytes), expected "
          f"{expected.shape}")


def make_paddle(rng):
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    p = {
        "conv2d_0.w_0": (rng.standard_normal((8, 3, 3, 3)) * 0.3
                         ).astype(np.float32),
        "conv2d_0.b_0": (rng.standard_normal(8) * 0.1).astype(np.float32),
        "batch_norm_0.w_0": (1 + 0.1 * rng.standard_normal(8)
                             ).astype(np.float32),
        "batch_norm_0.b_0": (0.1 * rng.standard_normal(8)
                             ).astype(np.float32),
        "batch_norm_0.w_1": (0.05 * rng.standard_normal(8)
                             ).astype(np.float32),
        "batch_norm_0.w_2": (1 + 0.1 * rng.random(8)).astype(np.float32),
        "linear_0.w_0": (rng.standard_normal((8 * 8 * 8, 10)) * 0.05
                         ).astype(np.float32),
        "linear_0.b_0": (rng.standard_normal(10) * 0.1).astype(np.float32),
    }
    nodes = [
        node("Conv", "p2o.Conv.0", ["inputs", "conv2d_0.w_0",
                                    "conv2d_0.b_0"], ["conv2d_0.tmp_0"],
             kernel_shape=[3, 3], strides=[1, 1], pads=[1, 1, 1, 1],
             dilations=[1, 1], group=1),
        node("BatchNormalization", "p2o.BatchNormalization.0",
             ["conv2d_0.tmp_0", "batch_norm_0.w_0", "batch_norm_0.b_0",
              "batch_norm_0.w_1", "batch_norm_0.w_2"],
             ["batch_norm_0.tmp_2"], epsilon=1e-5, momentum=0.9),
        node("Relu", "p2o.Relu.0", ["batch_norm_0.tmp_2"],
             ["relu_0.tmp_0"]),
        node("AveragePool", "p2o.AveragePool.0", ["relu_0.tmp_0"],
             ["pool2d_0.tmp_0"], kernel_shape=[2, 2], strides=[2, 2],
             pads=[0, 0, 0, 0], count_include_pad=0),
        node("Flatten", "p2o.Flatten.0", ["pool2d_0.tmp_0"],
             ["flatten_0.tmp_0"], axis=1),
        node("MatMul", "p2o.MatMul.0", ["flatten_0.tmp_0", "linear_0.w_0"],
             ["linear_0.tmp_0"]),
        node("Add", "p2o.Add.0", ["linear_0.tmp_0", "linear_0.b_0"],
             ["linear_0.tmp_1"]),
        node("Softmax", "p2o.Softmax.0", ["linear_0.tmp_1"],
             ["softmax_0.tmp_0"], axis=-1),
    ]
    h = ref_conv(x, p["conv2d_0.w_0"], p["conv2d_0.b_0"], 1, 1)
    h = ref_bn(h, p["batch_norm_0.w_0"], p["batch_norm_0.b_0"],
               p["batch_norm_0.w_1"], p["batch_norm_0.w_2"], 1e-5)
    h = np.maximum(h, 0)
    h = ref_avgpool_excl(h, 2, 2, 0)
    h = h.reshape(2, -1)
    h = h @ p["linear_0.w_0"] + p["linear_0.b_0"]
    expected = ref_softmax(h)
    write_model("paddle", "PaddlePaddle", 11, nodes, p, "inputs",
                [2, 3, 16, 16], "softmax_0.tmp_0", [2, 10], x, expected,
                producer_version="2.4")


def make_oneflow(rng):
    x = rng.standard_normal((1, 4, 12, 12)).astype(np.float32)
    p = {
        "model.conv1.weight": (rng.standard_normal((8, 4, 3, 3)) * 0.25
                               ).astype(np.float32),
        "model.bn1.weight": (1 + 0.1 * rng.standard_normal(8)
                             ).astype(np.float32),
        "model.bn1.bias": (0.1 * rng.standard_normal(8)).astype(np.float32),
        "model.bn1.running_mean": (0.05 * rng.standard_normal(8)
                                   ).astype(np.float32),
        "model.bn1.running_var": (1 + 0.1 * rng.random(8)
                                  ).astype(np.float32),
        "model.fc.weight_T": (rng.standard_normal((8 * 6 * 6, 12)) * 0.05
                              ).astype(np.float32),
        "model.fc.bias": (rng.standard_normal(12) * 0.1).astype(np.float32),
    }
    nodes = [
        node("Conv", "model.conv1", ["x.1", "model.conv1.weight"],
             ["conv1_y"], kernel_shape=[3, 3], strides=[1, 1],
             pads=[1, 1, 1, 1], dilations=[1, 1], group=1),
        node("BatchNormalization", "model.bn1",
             ["conv1_y", "model.bn1.weight", "model.bn1.bias",
              "model.bn1.running_mean", "model.bn1.running_var"],
             ["bn1_y"], epsilon=1e-5),
        node("Relu", "model.relu", ["bn1_y"], ["relu_y"]),
        node("MaxPool", "model.pool", ["relu_y"], ["pool_y"],
             kernel_shape=[2, 2], strides=[2, 2], pads=[0, 0, 0, 0]),
        node("Flatten", "model.flatten", ["pool_y"], ["flat_y"], axis=1),
        node("MatMul", "model.fc-matmul", ["flat_y", "model.fc.weight_T"],
             ["fc_mm"]),
        node("Add", "model.fc-add", ["fc_mm", "model.fc.bias"], ["out.1"]),
    ]
    h = ref_conv(x, p["model.conv1.weight"], None, 1, 1)
    h = ref_bn(h, p["model.bn1.weight"], p["model.bn1.bias"],
               p["model.bn1.running_mean"], p["model.bn1.running_var"],
               1e-5)
    h = np.maximum(h, 0)
    h = ref_maxpool(h, 2, 2)
    h = h.reshape(1, -1)
    expected = (h @ p["model.fc.weight_T"] + p["model.fc.bias"]
                ).astype(np.float32)
    write_model("oneflow", "oneflow-onnx", 10, nodes, p, "x.1",
                [1, 4, 12, 12], "out.1", [1, 12], x, expected,
                producer_version="0.6")


def make_caffe(rng):
    x = rng.standard_normal((1, 3, 15, 15)).astype(np.float32)
    p = {
        "conv1_w": (rng.standard_normal((6, 3, 5, 5)) * 0.2
                    ).astype(np.float32),
        "conv1_b": (rng.standard_normal(6) * 0.1).astype(np.float32),
        "fc6_w": (rng.standard_normal((10, 6 * 6 * 6)) * 0.05
                  ).astype(np.float32),
        "fc6_b": (rng.standard_normal(10) * 0.1).astype(np.float32),
    }
    nodes = [
        node("Conv", "conv1", ["data", "conv1_w", "conv1_b"], ["conv1"],
             kernel_shape=[5, 5], strides=[1, 1], pads=[0, 0, 0, 0],
             dilations=[1, 1], group=1),
        node("Relu", "relu1", ["conv1"], ["relu1"]),
        node("LRN", "norm1", ["relu1"], ["norm1"], size=5, alpha=1e-4,
             beta=0.75, bias=1.0),
        # caffe pools with CEIL rounding (its signature difference)
        node("MaxPool", "pool1", ["norm1"], ["pool1"], kernel_shape=[2, 2],
             strides=[2, 2], pads=[0, 0, 0, 0], ceil_mode=1),
        node("Flatten", "flatten6", ["pool1"], ["flat6"], axis=1),
        node("Gemm", "fc6", ["flat6", "fc6_w", "fc6_b"], ["fc6"],
             alpha=1.0, beta=1.0, transA=0, transB=1),
        node("Softmax", "prob", ["fc6"], ["prob"], axis=-1),
    ]
    h = ref_conv(x, p["conv1_w"], p["conv1_b"], 1, 0)
    h = np.maximum(h, 0)
    h = ref_lrn(h, 5, 1e-4, 0.75, 1.0)
    h = ref_maxpool(h, 2, 2, ceil=True)
    h = h.reshape(1, -1)
    expected = ref_softmax(h @ p["fc6_w"].T + p["fc6_b"])
    write_model("caffe", "caffe2onnx", 11, nodes, p, "data",
                [1, 3, 15, 15], "prob", [1, 10], x, expected)


def make_coreml(rng):
    x = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    p = {
        "convolution_W": (rng.standard_normal((8, 3, 3, 3)) * 0.25
                          ).astype(np.float32),
        "convolution_B": (rng.standard_normal(8) * 0.1).astype(np.float32),
        "batchnorm_gamma": (1 + 0.1 * rng.standard_normal(8)
                            ).astype(np.float32),
        "batchnorm_beta": (0.1 * rng.standard_normal(8)).astype(np.float32),
        "batchnorm_mean": (0.05 * rng.standard_normal(8)
                           ).astype(np.float32),
        "batchnorm_variance": (1 + 0.1 * rng.random(8)).astype(np.float32),
        "innerProduct_W": (rng.standard_normal((10, 8)) * 0.2
                           ).astype(np.float32),
        "innerProduct_B": (rng.standard_normal(10) * 0.1
                           ).astype(np.float32),
    }
    nodes = [
        node("Conv", "convolution", ["image", "convolution_W",
                                     "convolution_B"], ["convolution_out"],
             kernel_shape=[3, 3], strides=[1, 1], pads=[1, 1, 1, 1],
             dilations=[1, 1], group=1),
        node("BatchNormalization", "batchnorm",
             ["convolution_out", "batchnorm_gamma", "batchnorm_beta",
              "batchnorm_mean", "batchnorm_variance"], ["batchnorm_out"],
             epsilon=1e-5),
        node("Relu", "activation", ["batchnorm_out"], ["activation_out"]),
        node("GlobalAveragePool", "pooling", ["activation_out"],
             ["pooling_out"]),
        node("Flatten", "flatten", ["pooling_out"], ["flatten_out"],
             axis=1),
        node("Gemm", "innerProduct", ["flatten_out", "innerProduct_W",
                                      "innerProduct_B"],
             ["innerProduct_out"], alpha=1.0, beta=1.0, transA=0,
             transB=1),
        node("Softmax", "softmax", ["innerProduct_out"], ["classLabel"],
             axis=-1),
    ]
    h = ref_conv(x, p["convolution_W"], p["convolution_B"], 1, 1)
    h = ref_bn(h, p["batchnorm_gamma"], p["batchnorm_beta"],
               p["batchnorm_mean"], p["batchnorm_variance"], 1e-5)
    h = np.maximum(h, 0)
    h = h.mean((2, 3)).reshape(1, -1)
    expected = ref_softmax(h @ p["innerProduct_W"].T + p["innerProduct_B"])
    write_model("coreml", "OnnxMLTools", 11, nodes, p, "image",
                [1, 3, 16, 16], "classLabel", [1, 10], x, expected,
                producer_version="1.11")


def make_darknet(rng):
    x = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    p = {
        "conv_0_weights": (rng.standard_normal((8, 3, 3, 3)) * 0.25
                           ).astype(np.float32),
        "bn_0_gamma": (1 + 0.1 * rng.standard_normal(8)).astype(np.float32),
        "bn_0_beta": (0.1 * rng.standard_normal(8)).astype(np.float32),
        "bn_0_mean": (0.05 * rng.standard_normal(8)).astype(np.float32),
        "bn_0_var": (1 + 0.1 * rng.random(8)).astype(np.float32),
        "conv_1_weights": (rng.standard_normal((16, 8, 3, 3)) * 0.15
                           ).astype(np.float32),
        "bn_1_gamma": (1 + 0.1 * rng.standard_normal(16)
                       ).astype(np.float32),
        "bn_1_beta": (0.1 * rng.standard_normal(16)).astype(np.float32),
        "bn_1_mean": (0.05 * rng.standard_normal(16)).astype(np.float32),
        "bn_1_var": (1 + 0.1 * rng.random(16)).astype(np.float32),
        "upsample_scales": np.asarray([1.0, 1.0, 2.0, 2.0], np.float32),
        "conv_2_weights": (rng.standard_normal((5, 24, 1, 1)) * 0.2
                           ).astype(np.float32),
        "conv_2_bias": (rng.standard_normal(5) * 0.1).astype(np.float32),
    }
    nodes = [
        node("Conv", "conv_0", ["000_net", "conv_0_weights"], ["conv_0"],
             kernel_shape=[3, 3], strides=[1, 1], pads=[1, 1, 1, 1],
             dilations=[1, 1], group=1),
        node("BatchNormalization", "bn_0",
             ["conv_0", "bn_0_gamma", "bn_0_beta", "bn_0_mean",
              "bn_0_var"], ["bn_0"], epsilon=1e-5),
        node("LeakyRelu", "leaky_0", ["bn_0"], ["leaky_0"], alpha=0.1),
        node("Conv", "conv_1", ["leaky_0", "conv_1_weights"], ["conv_1"],
             kernel_shape=[3, 3], strides=[2, 2], pads=[1, 1, 1, 1],
             dilations=[1, 1], group=1),
        node("BatchNormalization", "bn_1",
             ["conv_1", "bn_1_gamma", "bn_1_beta", "bn_1_mean",
              "bn_1_var"], ["bn_1"], epsilon=1e-5),
        node("LeakyRelu", "leaky_1", ["bn_1"], ["leaky_1"], alpha=0.1),
        # YOLO upsample + route (concat) back to the stride-1 feature
        node("Upsample", "upsample_0", ["leaky_1", "upsample_scales"],
             ["upsample_0"], mode="nearest"),
        node("Concat", "route_0", ["upsample_0", "leaky_0"], ["route_0"],
             axis=1),
        node("Conv", "conv_2", ["route_0", "conv_2_weights",
                                "conv_2_bias"], ["082_convolutional"],
             kernel_shape=[1, 1], strides=[1, 1], pads=[0, 0, 0, 0],
             dilations=[1, 1], group=1),
    ]
    h0 = leaky(ref_bn(ref_conv(x, p["conv_0_weights"], None, 1, 1),
                      p["bn_0_gamma"], p["bn_0_beta"], p["bn_0_mean"],
                      p["bn_0_var"], 1e-5))
    h1 = leaky(ref_bn(ref_conv(h0, p["conv_1_weights"], None, 2, 1),
                      p["bn_1_gamma"], p["bn_1_beta"], p["bn_1_mean"],
                      p["bn_1_var"], 1e-5))
    h = np.concatenate([ref_upsample2x(h1), h0], axis=1)
    expected = ref_conv(h, p["conv_2_weights"], p["conv_2_bias"], 1, 0)
    write_model("darknet", "darknet2onnx", 9, nodes, p, "000_net",
                [1, 3, 16, 16], "082_convolutional", [1, 5, 16, 16], x,
                expected)


def main():
    rng = np.random.default_rng(11)
    make_paddle(rng)
    make_oneflow(rng)
    make_caffe(rng)
    make_coreml(rng)
    make_darknet(rng)


if __name__ == "__main__":
    main()
