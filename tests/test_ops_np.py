"""Numpy oracle op tests — direct-loop references for the structural kernels.

The analog of the reference's topi numeric checks vs numpy
(`tests/python/topi/`, SURVEY.md §4 'Oracle = numpy')."""

import numpy as np
import pytest

from tachikoma_tpu import GraphBuilder, infer_types, run_graph


def run_op(op, arrays, **attrs):
    b = GraphBuilder()
    names = []
    for i, a in enumerate(arrays):
        names.append(b.var(f"in{i}", a.shape, str(a.dtype)))
    out = b.call(op, *names, **attrs)
    g = infer_types(b.build(out))
    return run_graph(g, {f"in{i}": a for i, a in enumerate(arrays)})[0]


def ref_conv2d(data, weight, strides, padding, dilation, groups):
    n, h, w, cin = data.shape
    kh, kw, wcin, cout = weight.shape
    sh, sw = strides
    dh, dw = dilation
    pt, pl, pb, pr = padding
    padded = np.pad(data, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    oh = (h + pt + pb - dh * (kh - 1) - 1) // sh + 1
    ow = (w + pl + pr - dw * (kw - 1) - 1) // sw + 1
    out = np.zeros((n, oh, ow, cout), dtype=np.float64)
    cpg, opg = cin // groups, cout // groups
    for b_ in range(n):
        for i in range(oh):
            for j in range(ow):
                for g in range(groups):
                    for oc in range(opg):
                        acc = 0.0
                        for ki in range(kh):
                            for kj in range(kw):
                                for ic in range(cpg):
                                    acc += (
                                        padded[b_, i * sh + ki * dh, j * sw + kj * dw, g * cpg + ic]
                                        * weight[ki, kj, ic, g * opg + oc]
                                    )
                        out[b_, i, j, g * opg + oc] = acc
    return out


@pytest.mark.parametrize(
    "strides,padding,dilation,groups",
    [
        ((1, 1), (0, 0, 0, 0), (1, 1), 1),
        ((2, 2), (1, 1, 1, 1), (1, 1), 1),
        ((1, 1), (1, 2, 1, 2), (2, 2), 1),
        ((1, 1), (1, 1, 1, 1), (1, 1), 2),   # grouped
        ((2, 2), (1, 1, 1, 1), (1, 1), 4),   # depthwise (cin=groups)
    ],
)
def test_conv2d_vs_loop(rng, strides, padding, dilation, groups):
    cin, cout = 4, 8
    data = rng.standard_normal((2, 7, 9, cin), dtype=np.float32)
    weight = rng.standard_normal((3, 3, cin // groups, cout), dtype=np.float32)
    got = run_op(
        "nn.conv2d", [data, weight],
        strides=strides, padding=padding, dilation=dilation, groups=groups,
    )
    want = ref_conv2d(data, weight, strides, padding, dilation, groups)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv2d_int_exact(rng):
    data = rng.integers(-128, 127, (1, 6, 6, 3), dtype=np.int64).astype(np.int8)
    weight = rng.integers(-128, 127, (3, 3, 3, 5), dtype=np.int64).astype(np.int8)
    got = run_op("nn.conv2d", [data, weight], padding=(1, 1, 1, 1), out_dtype="int32")
    want = ref_conv2d(data.astype(np.float64), weight.astype(np.float64),
                      (1, 1), (1, 1, 1, 1), (1, 1), 1)
    np.testing.assert_array_equal(got, want.astype(np.int32))
    assert got.dtype == np.int32


def test_conv2d_transpose(rng):
    data = rng.standard_normal((1, 4, 4, 3), dtype=np.float32)
    weight = rng.standard_normal((3, 3, 3, 5), dtype=np.float32)
    got = run_op("nn.conv2d_transpose", [data, weight], strides=(2, 2), padding=(1, 1, 1, 1))
    # cross-check with torch
    torch = pytest.importorskip("torch")
    tw = torch.from_numpy(weight.transpose(2, 3, 0, 1))  # IOHW
    td = torch.from_numpy(data.transpose(0, 3, 1, 2))
    want = torch.nn.functional.conv_transpose2d(td, tw, stride=2, padding=1)
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def test_dense_and_matmul(rng):
    a = rng.standard_normal((5, 8), dtype=np.float32)
    w = rng.standard_normal((8, 3), dtype=np.float32)
    np.testing.assert_allclose(run_op("nn.dense", [a, w]), a @ w, rtol=1e-5)
    x = rng.standard_normal((2, 4, 6), dtype=np.float32)
    y = rng.standard_normal((2, 6, 5), dtype=np.float32)
    np.testing.assert_allclose(run_op("nn.batch_matmul", [x, y]), x @ y, rtol=1e-5)
    yt = np.swapaxes(y, 1, 2)
    np.testing.assert_allclose(
        run_op("nn.batch_matmul", [x, yt], transpose_b=True), x @ y, rtol=1e-5
    )


def test_pooling(rng):
    torch = pytest.importorskip("torch")
    data = rng.standard_normal((2, 8, 8, 3), dtype=np.float32)
    td = torch.from_numpy(data.transpose(0, 3, 1, 2))
    got = run_op("nn.max_pool2d", [data], pool_size=(3, 3), strides=(2, 2), padding=(1, 1, 1, 1))
    want = torch.nn.functional.max_pool2d(td, 3, 2, padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want)
    got = run_op("nn.avg_pool2d", [data], pool_size=(2, 2), strides=(2, 2), padding=(0, 0, 0, 0))
    want = torch.nn.functional.avg_pool2d(td, 2, 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # count_include_pad=False semantics
    got = run_op(
        "nn.avg_pool2d", [data],
        pool_size=(3, 3), strides=(2, 2), padding=(1, 1, 1, 1), count_include_pad=False,
    )
    want = (
        torch.nn.functional.avg_pool2d(td, 3, 2, padding=1, count_include_pad=False)
        .numpy().transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_global_and_adaptive_pool(rng):
    data = rng.standard_normal((2, 7, 5, 3), dtype=np.float32)
    got = run_op("nn.global_avg_pool2d", [data])
    np.testing.assert_allclose(got, data.mean(axis=(1, 2), keepdims=True), rtol=1e-5)
    torch = pytest.importorskip("torch")
    td = torch.from_numpy(data.transpose(0, 3, 1, 2))
    got = run_op("nn.adaptive_avg_pool2d", [data], output_size=(3, 2))
    want = torch.nn.functional.adaptive_avg_pool2d(td, (3, 2)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_batch_layer_norm(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, 4, 4, 8), dtype=np.float32)
    gamma = rng.standard_normal(8, dtype=np.float32)
    beta = rng.standard_normal(8, dtype=np.float32)
    mean = rng.standard_normal(8, dtype=np.float32)
    var = np.abs(rng.standard_normal(8)).astype(np.float32) + 0.5
    got = run_op("nn.batch_norm", [x, gamma, beta, mean, var], epsilon=1e-5)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = torch.nn.functional.batch_norm(
        tx, torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(gamma), torch.from_numpy(beta), eps=1e-5,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    got = run_op("nn.layer_norm", [x, gamma, beta], axis=-1, epsilon=1e-5)
    want = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (8,), torch.from_numpy(gamma), torch.from_numpy(beta), 1e-5
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_softmax_gelu(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((3, 10), dtype=np.float32)
    np.testing.assert_allclose(
        run_op("nn.softmax", [x], axis=-1),
        torch.softmax(torch.from_numpy(x), -1).numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        run_op("nn.log_softmax", [x], axis=-1),
        torch.log_softmax(torch.from_numpy(x), -1).numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        run_op("nn.gelu", [x]),
        torch.nn.functional.gelu(torch.from_numpy(x)).numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        run_op("nn.gelu", [x], approximate="tanh"),
        torch.nn.functional.gelu(torch.from_numpy(x), approximate="tanh").numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_shape_ops(rng):
    x = rng.standard_normal((2, 3, 4), dtype=np.float32)
    np.testing.assert_array_equal(run_op("reshape", [x], newshape=(6, 4)), x.reshape(6, 4))
    np.testing.assert_array_equal(run_op("reshape", [x], newshape=(2, -1)), x.reshape(2, 12))
    np.testing.assert_array_equal(run_op("transpose", [x], axes=(2, 0, 1)), x.transpose(2, 0, 1))
    np.testing.assert_array_equal(run_op("transpose", [x]), x.T)
    np.testing.assert_array_equal(
        run_op("strided_slice", [x], begin=(0, 1), end=(2, 3), strides=(1, 1)), x[0:2, 1:3]
    )
    np.testing.assert_array_equal(
        run_op("concatenate", [x, x], axis=1), np.concatenate([x, x], axis=1)
    )
    np.testing.assert_array_equal(
        run_op("nn.pad", [x], pad_width=((0, 0), (1, 2), (0, 0))),
        np.pad(x, ((0, 0), (1, 2), (0, 0))),
    )
    np.testing.assert_array_equal(run_op("tile", [x], reps=(1, 2, 1)), np.tile(x, (1, 2, 1)))


def test_reductions(rng):
    x = rng.standard_normal((3, 4, 5), dtype=np.float32)
    np.testing.assert_allclose(run_op("sum", [x], axis=(1,)), x.sum(1), rtol=1e-5)
    np.testing.assert_allclose(run_op("mean", [x], axis=(0, 2)), x.mean((0, 2)), rtol=1e-5)
    np.testing.assert_array_equal(run_op("max", [x], axis=(2,), keepdims=True), x.max(2, keepdims=True))
    np.testing.assert_array_equal(run_op("argmax", [x], axis=(1,)), x.argmax(1).astype(np.int32))
    xi = rng.integers(-10, 10, (4, 5), dtype=np.int64).astype(np.int8)
    got = run_op("sum", [xi], axis=(0,))
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, xi.astype(np.int32).sum(0))


def test_cast_truncates():
    x = np.array([1.7, -1.7, 2.5, -2.5], dtype=np.float32)
    got = run_op("cast", [x], dtype="int32")
    np.testing.assert_array_equal(got, [1, -1, 2, -2])


def test_divide_int_trunc():
    a = np.array([7, -7, 7, -7], dtype=np.int32)
    b = np.array([2, 2, -2, -2], dtype=np.int32)
    got = run_op("divide", [a, b])
    np.testing.assert_array_equal(got, [3, -3, -3, 3])


def test_take_clip_mode():
    x = np.arange(10, dtype=np.float32)
    idx = np.array([-1, 0, 5, 99], dtype=np.int32)
    got = run_op("take", [x, idx], axis=0, mode="clip")
    np.testing.assert_array_equal(got, [0, 0, 5, 9])


def test_one_hot():
    idx = np.array([0, 2, -1, 3], dtype=np.int32)
    got = run_op("one_hot", [idx], depth=3, on_value=1.0, off_value=0.0, dtype="float32")
    want = np.zeros((4, 3), np.float32)
    want[0, 0] = want[1, 2] = 1.0
    np.testing.assert_array_equal(got, want)


def test_depth_space(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((1, 4, 6, 8), dtype=np.float32)
    got = run_op("nn.depth_to_space", [x], block_size=2, mode="CRD")
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = torch.nn.functional.pixel_shuffle(tx, 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(got, want)
    back = run_op("nn.space_to_depth", [got], block_size=2)
    assert back.shape == x.shape


def test_take_onehot_path_matches_oracle(rng):
    """The embedding-pattern take (2-D table, axis 0) runs as a one-hot MXU
    matmul on the jax side — must stay exact vs np.take for int tables and
    bit-close for float, across clip/wrap modes."""
    import tachikoma_tpu.ops.jax_ops  # noqa: F401  (registers jax impls)
    from tachikoma_tpu.ir.graph import Node
    from tachikoma_tpu.ir.registry import get_op

    od = get_op("take")
    table_i = rng.integers(-127, 127, (300, 64)).astype(np.int8)
    table_f = rng.standard_normal((300, 64)).astype(np.float32)
    ids = rng.integers(-5, 305, (4, 7)).astype(np.int32)  # incl. OOB
    for mode in ("clip", "wrap"):
        node = Node("t", "take", ("a", "i"), {"axis": 0, "mode": mode})
        for tbl in (table_i, table_f):
            want = od.np_impl(tbl, ids, node=node)
            got = np.asarray(od.jax_impl(tbl, ids, node=node))
            if tbl.dtype == np.int8:
                assert (want == got).all()
            else:
                np.testing.assert_array_equal(want, got)
