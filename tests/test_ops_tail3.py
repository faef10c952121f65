"""Long-tail ops batch 3: numpy oracle vs XLA cross-checks + external
oracles (torch for pools/grads/division semantics, scipy for sparse,
np.fft for stft, zero-offset conv equivalence for deformable conv)."""

import numpy as np
import pytest

import tachikoma_tpu  # noqa: F401  (registers everything)
import tachikoma_tpu.ops.jax_ops  # noqa: F401
from tachikoma_tpu.ir.graph import Node
from tachikoma_tpu.ir.registry import get_op


def _run_both(op, args, attrs, exact=True, rtol=1e-5, check_infer=True):
    node = Node("t", op, tuple(f"i{i}" for i in range(len(args))), attrs)
    od = get_op(op)
    want = od.np_impl(*args, node=node)
    got = od.jax_impl(*args, node=node)
    multi = isinstance(want, (list, tuple))
    wants = list(want) if multi else [want]
    gots = list(got) if multi else [got]
    assert len(wants) == len(gots)
    for w, g in zip(wants, gots):
        g = np.asarray(g)
        if exact:
            np.testing.assert_array_equal(np.asarray(w), g)
        else:
            np.testing.assert_allclose(np.asarray(w), g, rtol=rtol, atol=1e-5)
    if check_infer and od.infer is not None:
        ins = [(tuple(a.shape), str(a.dtype)) for a in args]
        ty = od.infer(node, ins)
        tys = ty if isinstance(ty, list) else [ty]
        for (shape, dtp), w in zip(tys, wants):
            assert tuple(shape) == tuple(np.asarray(w).shape), op
    return wants


# -- trunc/floor division family ----------------------------------------------

def test_division_family_int(rng):
    import torch

    a = rng.integers(-50, 50, (3, 17)).astype(np.int32)
    b = rng.integers(1, 9, (3, 17)).astype(np.int32)
    b *= rng.choice([-1, 1], b.shape).astype(np.int32)
    fm = _run_both("floor_mod", [a, b], {})[0]
    tm = _run_both("trunc_mod", [a, b], {})[0]
    td = _run_both("trunc_divide", [a, b], {})[0]
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    np.testing.assert_array_equal(fm, torch.remainder(ta, tb).numpy())
    np.testing.assert_array_equal(tm, torch.fmod(ta, tb).numpy())
    np.testing.assert_array_equal(
        td, torch.div(ta, tb, rounding_mode="trunc").numpy())
    # trunc identity: a == trunc_divide(a,b)*b + trunc_mod(a,b)
    np.testing.assert_array_equal(a, td * b + tm)


def test_division_family_float(rng):
    a = rng.standard_normal((4, 9)).astype(np.float32) * 10
    b = (rng.standard_normal((4, 9)).astype(np.float32) + 3.5)
    _run_both("floor_mod", [a, b], {}, exact=False)
    _run_both("trunc_mod", [a, b], {}, exact=False)
    _run_both("trunc_divide", [a, b], {}, exact=False)


def test_broadcast_to_like(rng):
    a = rng.integers(-5, 5, (1, 6)).astype(np.int8)
    b = np.zeros((4, 3, 6), np.float32)
    out = _run_both("broadcast_to_like", [a, b], {})[0]
    assert out.shape == (4, 3, 6) and out.dtype == np.int8


# -- losses --------------------------------------------------------------------

def test_cross_entropy_with_logits(rng):
    import torch

    logp = np.log(rng.dirichlet(np.ones(10), size=6).astype(np.float32)
                  + 1e-9).astype(np.float32)
    tgt = rng.dirichlet(np.ones(10), size=6).astype(np.float32)
    out = _run_both("nn.cross_entropy_with_logits", [logp, tgt], {},
                    exact=False)[0]
    want = -(torch.from_numpy(tgt) * torch.from_numpy(logp)).sum() / 6
    np.testing.assert_allclose(out, want.numpy(), rtol=1e-5)


# -- adaptive max pools ----------------------------------------------------------

def test_adaptive_max_pool1d(rng):
    import torch.nn.functional as F
    import torch

    x = rng.standard_normal((2, 13, 5)).astype(np.float32)  # NWC
    out = _run_both("nn.adaptive_max_pool1d", [x], {"output_size": 4})[0]
    want = F.adaptive_max_pool1d(
        torch.from_numpy(x).permute(0, 2, 1), 4).permute(0, 2, 1).numpy()
    np.testing.assert_array_equal(out, want)


def test_adaptive_max_pool3d(rng):
    import torch.nn.functional as F
    import torch

    x = rng.standard_normal((2, 9, 7, 11, 3)).astype(np.float32)  # NDHWC
    out = _run_both("nn.adaptive_max_pool3d", [x],
                    {"output_size": (3, 2, 4)})[0]
    want = F.adaptive_max_pool3d(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3),
        (3, 2, 4)).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_array_equal(out, want)


# -- conv2d weight gradient -------------------------------------------------------

@pytest.mark.parametrize("stride,pad", [((1, 1), (1, 1, 1, 1)),
                                        ((2, 2), (0, 1, 0, 1))])
def test_conv2d_backward_weight(rng, stride, pad):
    import torch
    import torch.nn.functional as F

    data = rng.standard_normal((2, 9, 9, 4)).astype(np.float32)
    kh = kw = 3
    sh, sw = stride
    pt, pl, pb, pr = pad
    oh = (9 + pt + pb - kh) // sh + 1
    ow = (9 + pl + pr - kw) // sw + 1
    grad = rng.standard_normal((2, oh, ow, 6)).astype(np.float32)
    out = _run_both("nn.conv2d_backward_weight", [grad, data],
                    {"kernel_size": (kh, kw), "strides": stride,
                     "padding": pad}, exact=False)[0]
    # torch oracle: autograd through NCHW conv
    w = torch.zeros((6, 4, kh, kw), requires_grad=True)
    x = torch.from_numpy(data).permute(0, 3, 1, 2)
    xpad = F.pad(x, (pl, pr, pt, pb))
    y = F.conv2d(xpad, w, stride=stride)
    y.backward(torch.from_numpy(grad).permute(0, 3, 1, 2))
    want = w.grad.permute(2, 3, 1, 0).numpy()  # OIHW -> HWIO
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


# -- deformable conv ----------------------------------------------------------------

def test_deformable_conv2d_zero_offset_matches_conv(rng):
    """With all offsets zero, deformable conv == regular conv."""
    data = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    weight = rng.standard_normal((3, 3, 4, 5)).astype(np.float32)
    offset = np.zeros((2, 8, 8, 1 * 3 * 3 * 2), np.float32)
    attrs = {"strides": (1, 1), "padding": (1, 1, 1, 1),
             "kernel_size": (3, 3)}
    out = _run_both("nn.deformable_conv2d", [data, offset, weight], attrs,
                    exact=False)[0]
    node = Node("c", "nn.conv2d", ("a", "b"), attrs)
    want = get_op("nn.conv2d").np_impl(data, weight, node=node)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_deformable_conv2d_fractional_offsets(rng):
    data = rng.standard_normal((1, 6, 6, 2)).astype(np.float32)
    weight = rng.standard_normal((3, 3, 2, 3)).astype(np.float32)
    offset = (rng.standard_normal((1, 6, 6, 18)) * 0.7).astype(np.float32)
    _run_both("nn.deformable_conv2d", [data, offset, weight],
              {"strides": (1, 1), "padding": (1, 1, 1, 1),
               "kernel_size": (3, 3)}, exact=False, rtol=1e-4)


def test_deformable_conv2d_groups(rng):
    data = rng.standard_normal((1, 5, 5, 4)).astype(np.float32)
    weight = rng.standard_normal((3, 3, 4, 4)).astype(np.float32)
    offset = (rng.standard_normal((1, 5, 5, 2 * 9 * 2)) * 0.5
              ).astype(np.float32)
    _run_both("nn.deformable_conv2d", [data, offset, weight],
              {"strides": (1, 1), "padding": (1, 1, 1, 1),
               "kernel_size": (3, 3), "deformable_groups": 2},
              exact=False, rtol=1e-4)


# -- correlation -------------------------------------------------------------------

def test_correlation_identity_center(rng):
    """Correlating an image with itself: the zero-displacement channel is the
    per-position channel-mean of x*x."""
    x = rng.standard_normal((1, 3, 10, 10)).astype(np.float32)
    attrs = {"kernel_size": 1, "max_displacement": 2, "stride1": 1,
             "stride2": 2, "padding": 2, "is_multiply": True}
    out = _run_both("nn.correlation", [x, x], attrs, exact=False)[0]
    n, q2, oh, ow = out.shape
    assert q2 == 9
    center = out[:, q2 // 2]
    want = (x * x).mean(axis=1)  # padding=2 == max_displacement: full size
    assert center.shape == want.shape
    np.testing.assert_allclose(center, want, rtol=1e-5, atol=1e-6)


def test_correlation_abs_diff(rng):
    x = rng.standard_normal((2, 2, 8, 8)).astype(np.float32)
    y = rng.standard_normal((2, 2, 8, 8)).astype(np.float32)
    out = _run_both("nn.correlation", [x, y],
                    {"kernel_size": 3, "max_displacement": 1, "stride1": 1,
                     "stride2": 1, "padding": 2, "is_multiply": False},
                    exact=False)[0]
    assert (out >= -1e-6).all()


# -- sparse --------------------------------------------------------------------

def test_sparse_add(rng):
    from scipy import sparse

    dense = rng.standard_normal((5, 7)).astype(np.float32)
    sp = sparse.random(5, 7, density=0.4, format="csr",
                       dtype=np.float32, random_state=0)
    out = _run_both("nn.sparse_add",
                    [dense, sp.data.astype(np.float32),
                     sp.indices.astype(np.int32),
                     sp.indptr.astype(np.int32)], {}, exact=False)[0]
    np.testing.assert_allclose(out, dense + sp.toarray(), rtol=1e-6)


def test_sparse_transpose(rng):
    from scipy import sparse

    sp = sparse.random(6, 6, density=0.3, format="csr",
                       dtype=np.float32, random_state=1)
    data, indices, indptr = _run_both(
        "nn.sparse_transpose",
        [sp.data.astype(np.float32), sp.indices.astype(np.int32),
         sp.indptr.astype(np.int32)], {})
    want = sparse.csr_matrix(sp.T)
    want.sort_indices()
    got = sparse.csr_matrix((data, indices, indptr), shape=(6, 6))
    np.testing.assert_allclose(got.toarray(), want.toarray(), rtol=1e-6)


# -- stft ----------------------------------------------------------------------

@pytest.mark.parametrize("onesided", [True, False])
def test_stft_vs_fft(rng, onesided):
    n_fft, hop = 16, 4
    x = rng.standard_normal((2, 64)).astype(np.float32)
    win = np.hanning(n_fft).astype(np.float32)
    out = _run_both("stft", [x, win],
                    {"n_fft": n_fft, "hop_length": hop,
                     "onesided": onesided}, exact=False, rtol=1e-4)[0]
    frames = (64 - n_fft) // hop + 1
    freq = n_fft // 2 + 1 if onesided else n_fft
    assert out.shape == (2, freq, frames, 2)
    for f in range(frames):
        seg = x[:, f * hop: f * hop + n_fft] * win
        full = np.fft.fft(seg, axis=-1)
        spec = full[:, :freq]
        np.testing.assert_allclose(out[:, :, f, 0], spec.real,
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(out[:, :, f, 1], spec.imag,
                                   rtol=1e-3, atol=1e-4)


def test_stft_normalized(rng):
    x = rng.standard_normal((32,)).astype(np.float32)
    raw = _run_both("stft", [x, None],
                    {"n_fft": 8, "hop_length": 8}, exact=False,
                    check_infer=False)[0]
    nrm = _run_both("stft", [x, None],
                    {"n_fft": 8, "hop_length": 8, "normalized": True},
                    exact=False, check_infer=False)[0]
    np.testing.assert_allclose(nrm * np.sqrt(8), raw, rtol=1e-5)


# -- RPN proposal ----------------------------------------------------------------

def test_proposal(rng):
    n, na, h, w = 1, 3, 6, 6
    cls = rng.random((n, 2 * na, h, w)).astype(np.float32)
    bbox = (rng.standard_normal((n, 4 * na, h, w)) * 0.1).astype(np.float32)
    im_info = np.array([[96.0, 96.0, 1.0]], np.float32)
    attrs = {"scales": (2.0, 4.0), "ratios": (1.0,), "feature_stride": 16,
             "threshold": 0.7, "rpn_pre_nms_top_n": 50,
             "rpn_post_nms_top_n": 8, "rpn_min_size": 4}
    # note: scales x ratios must produce `na` anchors per position
    attrs["scales"] = (2.0, 4.0, 8.0)
    out = _run_both("vision.proposal", [cls, bbox, im_info], attrs)[0]
    assert out.shape == (8, 5)
    # boxes clipped to the image
    assert (out[:, 1] >= 0).all() and (out[:, 3] <= 95).all()
    assert (out[:, 2] >= 0).all() and (out[:, 4] <= 95).all()
    # batch index column
    assert (out[:, 0] == 0).all()


def test_dynamic_slice_update(rng):
    """dynamic_slice / dynamic_update_slice: runtime start indices with lax
    clamping semantics, oracle == XLA."""
    from tachikoma_tpu import GraphBuilder, infer_types, run_graph
    from tachikoma_tpu.runtime.executor import run_graph_jax

    b = GraphBuilder()
    a = b.var("a", (4, 8), "int32")
    u = b.var("u", (2, 8), "int32")
    p = b.var("p", (), "int32")
    z = b.const(np.int32(0))
    upd = b.call("dynamic_update_slice", a, u, p, z)
    sl = b.call("dynamic_slice", upd, p, z, sizes=(2, 8))
    g = infer_types(b.build([upd, sl]))
    av = rng.integers(0, 100, (4, 8)).astype(np.int32)
    uv = rng.integers(0, 100, (2, 8)).astype(np.int32)
    for pos in (0, 1, 2, 7):  # 7 clamps to 2
        feeds = {"a": av, "u": uv, "p": np.int32(pos)}
        o = run_graph(g, feeds)
        j = run_graph_jax(g, feeds)
        for x, y in zip(o, j):
            assert (np.asarray(x) == np.asarray(y)).all(), f"pos {pos}"
    o = run_graph(g, {"a": av, "u": uv, "p": np.int32(1)})
    want = av.copy()
    want[1:3] = uv
    np.testing.assert_array_equal(o[0], want)
    np.testing.assert_array_equal(o[1], want[1:3])
