"""ONNX converter long tail: single-op import parity vs numpy/torch."""

import numpy as np
import pytest

from tachikoma_tpu import run_graph
from tachikoma_tpu.frontend.onnx import from_onnx

from test_frontend_onnx import make_model, node


def one_op(op, arrs, out_shape, rng=None, initializers=None, n_out=1,
           extra_inputs=None, **attrs):
    """Build a one-node model: first input is dynamic, rest initializers."""
    initializers = dict(initializers or {})
    names = [f"i{k}" for k in range(len(arrs))]
    dyn = {names[0]: arrs[0].shape}
    for nm, a in zip(names[1:], arrs[1:]):
        initializers[nm] = a
    outs = [f"o{k}" for k in range(n_out)]
    model = make_model(
        nodes=[node(op, names, outs, **attrs)],
        inputs=dyn,
        outputs={o: out_shape for o in outs},
        initializers=initializers,
    )
    g = from_onnx(model)
    res = run_graph(g, {names[0]: arrs[0]})
    return res if n_out > 1 else res[0]


def test_unary_family(rng):
    x = (rng.standard_normal((2, 7)).astype(np.float32) * 2)
    for op, fn in [
        ("Neg", np.negative), ("Abs", np.abs), ("Floor", np.floor),
        ("Ceil", np.ceil), ("Sign", np.sign), ("Sin", np.sin),
        ("Cos", np.cos), ("Tan", np.tan), ("Sinh", np.sinh),
        ("Cosh", np.cosh),
        ("Log", np.log),
    ]:
        a = np.abs(x) + 1.0 if op == "Log" else x
        got = one_op(op, [a], a.shape)
        np.testing.assert_allclose(got, fn(a), rtol=1e-5, atol=1e-6)


def test_reciprocal_softplus_softsign(rng):
    x = rng.standard_normal((3, 5)).astype(np.float32) + 2.5
    np.testing.assert_allclose(one_op("Reciprocal", [x], x.shape), 1.0 / x,
                               rtol=1e-5)
    np.testing.assert_allclose(one_op("Softplus", [x], x.shape),
                               np.log1p(np.exp(x)), rtol=1e-4)
    np.testing.assert_allclose(one_op("Softsign", [x], x.shape),
                               x / (1 + np.abs(x)), rtol=1e-5)


def test_hard_activations(rng):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((4, 9)).astype(np.float32) * 3
    tx = torch.from_numpy(x)
    np.testing.assert_allclose(
        one_op("HardSigmoid", [x], x.shape, alpha=1 / 6, beta=0.5),
        F.hardsigmoid(tx).numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        one_op("HardSwish", [x], x.shape),
        F.hardswish(tx).numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        one_op("Elu", [x], x.shape, alpha=1.0),
        F.elu(tx).numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        one_op("Selu", [x], x.shape),
        F.selu(tx).numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        one_op("Mish", [x], x.shape),
        F.mish(tx).numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        one_op("ThresholdedRelu", [x], x.shape, alpha=0.5),
        np.where(x > 0.5, x, 0.0), rtol=1e-6)
    np.testing.assert_allclose(
        one_op("LogSoftmax", [x], x.shape, axis=-1),
        F.log_softmax(tx, -1).numpy(), rtol=1e-5, atol=1e-6)


def test_prelu(rng):
    x = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)  # NCHW
    slope = np.array([0.1, 0.2, 0.3], np.float32).reshape(3, 1, 1)
    got = one_op("PRelu", [x, slope], x.shape)
    want = np.where(x >= 0, x, x * slope[None])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # scalar slope
    got = one_op("PRelu", [x, np.array([0.25], np.float32)], x.shape)
    np.testing.assert_allclose(got, np.where(x >= 0, x, 0.25 * x), rtol=1e-6)


def test_compare_logical(rng):
    a = rng.integers(-3, 3, (4, 6)).astype(np.float32)
    b = rng.integers(-3, 3, (4, 6)).astype(np.float32)
    for op, fn in [("Equal", np.equal), ("Greater", np.greater),
                   ("Less", np.less), ("GreaterOrEqual", np.greater_equal),
                   ("LessOrEqual", np.less_equal)]:
        np.testing.assert_array_equal(one_op(op, [a, b], a.shape), fn(a, b))
    ba = a > 0
    bb = b > 0
    for op, fn in [("And", np.logical_and), ("Or", np.logical_or),
                   ("Xor", np.logical_xor)]:
        np.testing.assert_array_equal(one_op(op, [ba, bb], ba.shape),
                                      fn(ba, bb))
    np.testing.assert_array_equal(one_op("Not", [ba], ba.shape),
                                  np.logical_not(ba))


def test_mod(rng):
    a = rng.integers(-20, 20, (3, 8)).astype(np.int32)
    b = np.full((3, 8), 7, np.int32)
    np.testing.assert_array_equal(one_op("Mod", [a, b], a.shape),
                                  np.mod(a, b))
    af = a.astype(np.float32)
    bf = b.astype(np.float32)
    np.testing.assert_allclose(one_op("Mod", [af, bf], af.shape, fmod=1),
                               np.fmod(af, bf), rtol=1e-6)


def test_variadic(rng):
    xs = [rng.standard_normal((2, 5)).astype(np.float32) for _ in range(3)]
    np.testing.assert_allclose(one_op("Max", xs, xs[0].shape),
                               np.maximum.reduce(xs), rtol=1e-6)
    np.testing.assert_allclose(one_op("Min", xs, xs[0].shape),
                               np.minimum.reduce(xs), rtol=1e-6)
    np.testing.assert_allclose(one_op("Sum", xs, xs[0].shape),
                               np.add.reduce(xs), rtol=1e-6)
    np.testing.assert_allclose(one_op("Mean", xs, xs[0].shape),
                               np.mean(xs, axis=0), rtol=1e-6)


def test_reductions(rng):
    x = rng.standard_normal((2, 3, 5)).astype(np.float32)
    np.testing.assert_allclose(
        one_op("ReduceSum", [x], (2, 1, 5), axes=[1], keepdims=1),
        x.sum(1, keepdims=True), rtol=1e-5)
    np.testing.assert_allclose(
        one_op("ReduceMax", [x], (2, 5), axes=[1], keepdims=0),
        x.max(1), rtol=1e-6)
    np.testing.assert_allclose(
        one_op("ReduceMin", [x], (2, 5), axes=[1], keepdims=0),
        x.min(1), rtol=1e-6)
    np.testing.assert_allclose(
        one_op("ReduceProd", [x], (2, 5), axes=[1], keepdims=0),
        x.prod(1), rtol=1e-5)
    np.testing.assert_allclose(
        one_op("ReduceL1", [x], (2, 1, 5), axes=[1]),
        np.abs(x).sum(1, keepdims=True), rtol=1e-5)
    np.testing.assert_allclose(
        one_op("ReduceL2", [x], (2, 1, 5), axes=[1]),
        np.sqrt((x * x).sum(1, keepdims=True)), rtol=1e-5)
    np.testing.assert_allclose(
        one_op("ReduceSumSquare", [x], (2, 1, 5), axes=[1]),
        (x * x).sum(1, keepdims=True), rtol=1e-5)
    # opset-13 style: axes as a second (initializer) input
    np.testing.assert_allclose(
        one_op("ReduceSum", [x, np.array([2], np.int64)], (2, 3, 1)),
        x.sum(2, keepdims=True), rtol=1e-5)


def test_argmax_argmin(rng):
    x = rng.standard_normal((3, 7)).astype(np.float32)
    np.testing.assert_array_equal(
        one_op("ArgMax", [x], (3, 1), axis=1, keepdims=1),
        x.argmax(1, keepdims=True))
    np.testing.assert_array_equal(
        one_op("ArgMin", [x], (3,), axis=1, keepdims=0), x.argmin(1))


def test_expand_tile_range_where(rng):
    x = rng.standard_normal((3, 1)).astype(np.float32)
    np.testing.assert_array_equal(
        one_op("Expand", [x, np.array([2, 3, 4], np.int64)], (2, 3, 4)),
        np.broadcast_to(x, (2, 3, 4)))
    np.testing.assert_array_equal(
        one_op("Tile", [x, np.array([2, 3], np.int64)], (6, 3)),
        np.tile(x, (2, 3)))
    c = rng.random((4, 4)) > 0.5
    a = rng.standard_normal((4, 4)).astype(np.float32)
    b = rng.standard_normal((4, 4)).astype(np.float32)
    model = make_model(
        nodes=[node("Where", ["c", "a", "b"], ["y"])],
        inputs={"c": (4, 4)},
        outputs={"y": (4, 4)},
        initializers={"a": a, "b": b},
    )
    g = from_onnx(model)
    np.testing.assert_array_equal(run_graph(g, {"c": c})[0], np.where(c, a, b))


def test_range_folds(rng):
    x = rng.standard_normal((5,)).astype(np.float32)
    model = make_model(
        nodes=[
            node("Range", ["s", "l", "d"], ["r"]),
            node("Add", ["x", "r"], ["y"]),
        ],
        inputs={"x": (5,)},
        outputs={"y": (5,)},
        initializers={"s": np.float32(0), "l": np.float32(5),
                      "d": np.float32(1)},
    )
    g = from_onnx(model)
    np.testing.assert_allclose(run_graph(g, {"x": x})[0],
                               x + np.arange(5, dtype=np.float32), rtol=1e-6)


def test_onehot_cumsum_trilu(rng):
    idx = rng.integers(0, 5, (3, 4)).astype(np.int64)
    got = one_op("OneHot", [idx, np.int64(5),
                            np.array([0.0, 1.0], np.float32)], (3, 4, 5),
                 axis=-1)
    want = np.eye(5, dtype=np.float32)[idx]
    np.testing.assert_array_equal(got, want)

    x = rng.standard_normal((3, 6)).astype(np.float32)
    np.testing.assert_allclose(
        one_op("CumSum", [x, np.array(1, np.int64)], x.shape),
        np.cumsum(x, 1), rtol=1e-5)

    m = rng.standard_normal((4, 4)).astype(np.float32)
    np.testing.assert_array_equal(
        one_op("Trilu", [m], m.shape, upper=1), np.triu(m))
    np.testing.assert_array_equal(
        one_op("Trilu", [m, np.array(1, np.int64)], m.shape, upper=0),
        np.tril(m, 1))


def test_topk(rng):
    x = rng.standard_normal((3, 10)).astype(np.float32)
    vals, idx = one_op("TopK", [x, np.array([4], np.int64)], (3, 4),
                       n_out=2, axis=-1)
    order = np.argsort(-x, axis=-1, kind="stable")[:, :4]
    np.testing.assert_array_equal(idx, order)
    np.testing.assert_array_equal(vals, np.take_along_axis(x, order, -1))


def test_gather_scatter_family(rng):
    d = rng.standard_normal((4, 5)).astype(np.float32)
    i = rng.integers(0, 4, (2, 5)).astype(np.int64)
    np.testing.assert_array_equal(
        one_op("GatherElements", [d, i], i.shape, axis=0),
        np.take_along_axis(d, i, 0))
    u = rng.standard_normal((2, 5)).astype(np.float32)
    got = one_op("ScatterElements", [d, i, u], d.shape, axis=0)
    want = d.copy()
    np.put_along_axis(want, i, u, 0)
    np.testing.assert_array_equal(got, want)

    nd_i = np.array([[0, 1], [2, 3]], np.int64)
    np.testing.assert_array_equal(
        one_op("GatherND", [d, nd_i], (2,)), d[[0, 2], [1, 3]])
    upd = np.array([9.0, 8.0], np.float32)
    got = one_op("ScatterND", [d, nd_i, upd], d.shape)
    want = d.copy()
    want[0, 1] = 9.0
    want[2, 3] = 8.0
    np.testing.assert_array_equal(got, want)


def test_einsum_size(rng):
    a = rng.standard_normal((3, 4)).astype(np.float32)
    b = rng.standard_normal((4, 5)).astype(np.float32)
    np.testing.assert_allclose(
        one_op("Einsum", [a, b], (3, 5), equation="ij,jk->ik"),
        a @ b, rtol=1e-5)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    model = make_model(
        nodes=[node("Size", ["x"], ["s"]),
               node("Mul", ["x", "xx"], ["y"])],  # keep x live
        inputs={"x": (2, 3)},
        outputs={"y": (2, 3)},
        initializers={"xx": np.ones((2, 3), np.float32)},
    )
    g = from_onnx(model)  # Size folds; just check import works
    assert run_graph(g, {"x": x})[0].shape == (2, 3)


def test_conv_transpose(rng):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((1, 3, 5, 5)).astype(np.float32)
    w = rng.standard_normal((3, 4, 3, 3)).astype(np.float32)  # (CIN,COUT,KH,KW)
    bias = rng.standard_normal(4).astype(np.float32)
    got = one_op("ConvTranspose", [x, w, bias], (1, 4, 10, 10),
                 kernel_shape=[3, 3], strides=[2, 2], pads=[1, 1, 1, 1],
                 output_padding=[1, 1])
    want = F.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(bias),
        stride=2, padding=1, output_padding=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resize_upsample(rng):
    x = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
    got = one_op("Resize", [x, np.zeros(0, np.float32),
                            np.array([1, 1, 2, 2], np.float32)],
                 (1, 2, 8, 8), mode="nearest")
    want = x.repeat(2, axis=2).repeat(2, axis=3)
    np.testing.assert_array_equal(got, want)
    got = one_op("Upsample", [x, np.array([1, 1, 2, 2], np.float32)],
                 (1, 2, 8, 8), mode="nearest")
    np.testing.assert_array_equal(got, want)


def test_instance_norm(rng):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((2, 3, 6, 6)).astype(np.float32)
    g_ = np.abs(rng.standard_normal(3)).astype(np.float32) + 0.5
    b_ = rng.standard_normal(3).astype(np.float32)
    got = one_op("InstanceNormalization", [x, g_, b_], x.shape, epsilon=1e-5)
    want = F.instance_norm(
        torch.from_numpy(x), weight=torch.from_numpy(g_),
        bias=torch.from_numpy(b_)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_global_max_pool_d2s_s2d(rng):
    x = rng.standard_normal((2, 8, 4, 4)).astype(np.float32)
    got = one_op("GlobalMaxPool", [x], (2, 8, 1, 1))
    np.testing.assert_array_equal(got, x.max((2, 3), keepdims=True))

    import torch
    got = one_op("DepthToSpace", [x], (2, 2, 8, 8), blocksize=2, mode="DCR")
    want = torch.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    # DCR vs torch's CRD: torch pixel_shuffle IS the CRD order; DCR differs.
    n, c, h, w = x.shape
    want = x.reshape(n, 2, 2, c // 4, h, w).transpose(0, 3, 4, 1, 5, 2)
    want = want.reshape(n, c // 4, h * 2, w * 2)
    np.testing.assert_array_equal(got, want)

    y = rng.standard_normal((1, 2, 6, 6)).astype(np.float32)
    got = one_op("SpaceToDepth", [y], (1, 8, 3, 3), blocksize=2)
    n, c, h, w = y.shape
    want = y.reshape(n, c, h // 2, 2, w // 2, 2).transpose(0, 3, 5, 1, 2, 4)
    want = want.reshape(n, c * 4, h // 2, w // 2)
    np.testing.assert_array_equal(got, want)


def test_lrn(rng):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((1, 6, 5, 5)).astype(np.float32)
    got = one_op("LRN", [x], x.shape, size=3, alpha=1e-4, beta=0.75, bias=1.0)
    want = F.local_response_norm(torch.from_numpy(x), 3, alpha=1e-4,
                                 beta=0.75, k=1.0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
