"""Long-tail ops batch 2: numpy oracle vs XLA cross-checks + infer rules."""

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


# -- tensor ops --------------------------------------------------------------

def test_like_family(rng):
    a = rng.integers(-50, 50, (2, 12)).astype(np.int32)
    b = np.zeros((4, 6), np.int32)
    _run_both("reshape_like", [a, b], {})
    _run_both("cast_like", [a.astype(np.int8), b.astype(np.float32)], {})
    big = rng.standard_normal((5, 7, 3)).astype(np.float32)
    small = np.zeros((5, 4, 3), np.float32)
    _run_both("slice_like", [big, small], {})
    _run_both("slice_like", [big, np.zeros((2, 4), np.float32)],
              {"axes": (1,)})


def test_collapse_sum(rng):
    a = rng.integers(-5, 5, (4, 3, 6)).astype(np.int32)
    _run_both("collapse_sum_like", [a, np.zeros((3, 6), np.int32)], {})
    _run_both("collapse_sum_like", [a, np.zeros((4, 1, 6), np.int32)], {})
    _run_both("collapse_sum_to", [a], {"shape": (1, 6)})


def test_strided_set(rng):
    a = rng.integers(-50, 50, (6, 8)).astype(np.int32)
    v = rng.integers(-50, 50, (2, 3)).astype(np.int32)
    _run_both("strided_set", [a, v],
              {"begin": (1, 0), "end": (5, 6), "strides": (2, 2)})


def test_layout_transform(rng):
    a = rng.standard_normal((2, 4, 5, 3)).astype(np.float32)
    _run_both("layout_transform", [a],
              {"src_layout": "NHWC", "dst_layout": "NCHW"})
    with pytest.raises(ValueError):
        _run_both("layout_transform", [a],
                  {"src_layout": "NHWC", "dst_layout": "NCH"})


def test_adv_index(rng):
    a = rng.standard_normal((5, 6, 3)).astype(np.float32)
    i0 = rng.integers(0, 5, (4,)).astype(np.int32)
    i1 = rng.integers(0, 6, (4,)).astype(np.int32)
    _run_both("adv_index", [a, i0], {})
    _run_both("adv_index", [a, i0, i1], {})


def test_reinterpret(rng):
    a = rng.integers(-(2 ** 31), 2 ** 31 - 1, (3, 4), dtype=np.int64)
    a = a.astype(np.int32)
    _run_both("reinterpret", [a], {"dtype": "float32"})
    with pytest.raises(ValueError):
        _run_both("reinterpret", [a], {"dtype": "int8"})


# -- nn: dilate / space<->batch / upsampling / fifo --------------------------

def test_dilate(rng):
    a = rng.integers(-9, 9, (3, 4)).astype(np.int32)
    _run_both("nn.dilate", [a], {"strides": (2, 3)})
    _run_both("nn.dilate", [a.astype(np.float32)],
              {"strides": (2, 2), "dilation_value": -1.0})


def test_space_batch_roundtrip(rng):
    a = rng.integers(-9, 9, (2, 6, 4, 3)).astype(np.int32)
    attrs = {"block_shape": (2, 2), "paddings": ((0, 0), (0, 0))}
    (s2b,) = _run_both("nn.space_to_batch_nd", [a], attrs)
    (back,) = _run_both("nn.batch_to_space_nd", [s2b],
                        {"block_shape": (2, 2), "crops": ((0, 0), (0, 0))})
    np.testing.assert_array_equal(back, a)
    _run_both("nn.space_to_batch_nd", [a],
              {"block_shape": (2, 3), "paddings": ((1, 1), (1, 1))})


def test_upsampling(rng):
    a = rng.integers(-9, 9, (1, 4, 5, 3)).astype(np.int8)
    _run_both("nn.upsampling", [a], {"scale_h": 2.0, "scale_w": 3.0})
    v = rng.integers(-9, 9, (1, 2, 3, 4, 2)).astype(np.int8)
    _run_both("nn.upsampling3d", [v],
              {"scale_d": 2.0, "scale_h": 2.0, "scale_w": 1.5})


def test_fifo_buffer(rng):
    buf = rng.integers(-9, 9, (5, 3)).astype(np.int32)
    data = rng.integers(-9, 9, (2, 3)).astype(np.int32)
    (out,) = _run_both("nn.fifo_buffer", [data, buf], {"axis": 0})
    np.testing.assert_array_equal(out[-2:], data)
    np.testing.assert_array_equal(out[:3], buf[2:])


# -- nn: 3-D pools, adaptive, transposed convs -------------------------------

def test_pool3d(rng):
    x = rng.integers(-20, 20, (2, 5, 6, 7, 3)).astype(np.int8)
    attrs = {"pool_size": (2, 2, 2), "strides": (2, 2, 2),
             "padding": (1, 0, 1, 1, 0, 1)}
    _run_both("nn.max_pool3d", [x], attrs)
    _run_both("nn.avg_pool3d", [x.astype(np.float32)], attrs, exact=False)
    _run_both("nn.avg_pool3d", [x.astype(np.float32)],
              {**attrs, "count_include_pad": False}, exact=False)


def test_adaptive_pools(rng):
    x = rng.standard_normal((2, 11, 4)).astype(np.float32)
    _run_both("nn.adaptive_avg_pool1d", [x], {"output_size": 4}, exact=False)
    v = rng.standard_normal((1, 5, 7, 6, 2)).astype(np.float32)
    _run_both("nn.adaptive_avg_pool3d", [v], {"output_size": (2, 3, 3)},
              exact=False)


def test_conv1d_transpose(rng):
    x = rng.integers(-10, 10, (2, 7, 4)).astype(np.int8)
    w = rng.integers(-10, 10, (3, 4, 6)).astype(np.int8)
    _run_both("nn.conv1d_transpose", [x, w],
              {"strides": (2,), "padding": (1, 1), "output_padding": (1,),
               "out_dtype": "int32"})


def test_conv3d_transpose(rng):
    x = rng.integers(-6, 6, (1, 3, 4, 5, 2)).astype(np.int8)
    w = rng.integers(-6, 6, (2, 3, 3, 2, 4)).astype(np.int8)
    _run_both("nn.conv3d_transpose", [x, w],
              {"strides": (2, 1, 2), "padding": (0, 1, 1, 0, 1, 1),
               "out_dtype": "int32"})


# -- image -------------------------------------------------------------------

def test_resize_1d_3d(rng):
    a = rng.integers(-9, 9, (2, 6, 3)).astype(np.int8)
    _run_both("image.resize1d", [a], {"size": (9,)})
    v = rng.integers(-9, 9, (1, 3, 4, 5, 2)).astype(np.int8)
    _run_both("image.resize3d", [v], {"size": (6, 6, 6)})


def test_crop_and_resize(rng):
    data = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    boxes = np.array([[0.1, 0.1, 0.8, 0.9], [0.0, 0.0, 1.2, 1.0]], np.float32)
    idx = np.array([1, 0], np.int32)
    _run_both("image.crop_and_resize", [data, boxes, idx],
              {"crop_size": (4, 4)}, exact=False)
    _run_both("image.crop_and_resize", [data, boxes, idx],
              {"crop_size": (3, 5), "method": "nearest_neighbor",
               "extrapolation_value": -1.0})


def test_affine_grid_sample(rng):
    theta = np.array([[[1.0, 0.0, 0.1], [0.0, 1.0, -0.2]],
                      [[0.8, 0.2, 0.0], [-0.2, 0.8, 0.0]]], np.float32)
    (grid,) = _run_both("image.affine_grid", [theta],
                        {"target_shape": (5, 6)}, exact=False)
    data = rng.standard_normal((2, 3, 7, 7)).astype(np.float32)
    _run_both("image.grid_sample", [data, grid], {}, exact=False)
    _run_both("image.grid_sample", [data, grid],
              {"method": "nearest", "align_corners": False}, exact=False)


def test_dilation2d(rng):
    data = rng.integers(-20, 20, (2, 7, 7, 3)).astype(np.int8)
    w = rng.integers(-5, 5, (3, 3, 3)).astype(np.int8)
    _run_both("image.dilation2d", [data, w],
              {"strides": (2, 2), "padding": (1, 1, 1, 1),
               "dilations": (1, 1)})
    _run_both("image.dilation2d", [data.astype(np.float32),
                                   w.astype(np.float32)],
              {"dilations": (2, 2)})


# -- vision ------------------------------------------------------------------

def test_multibox_prior(rng):
    feat = np.zeros((1, 4, 6, 8), np.float32)
    (out,) = _run_both("vision.multibox_prior", [feat],
                       {"sizes": (0.5, 0.25), "ratios": (1.0, 2.0),
                        "clip": True}, exact=False)
    assert out.shape == (1, 4 * 6 * 3, 4)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_multibox_transform_loc(rng):
    b, nc, na = 2, 4, 10
    cls_prob = rng.random((b, nc, na)).astype(np.float32)
    loc_pred = 0.1 * rng.standard_normal((b, na * 4)).astype(np.float32)
    anchors = _run_both(
        "vision.multibox_prior", [np.zeros((1, 2, 5, 1), np.float32)],
        {"sizes": (0.4,), "ratios": (1.0,)}, exact=False)[0]
    out, cnt = _run_both("vision.multibox_transform_loc",
                         [cls_prob, loc_pred, anchors],
                         {"threshold": 0.3}, exact=False)
    assert out.shape == (b, na, 6) and cnt.shape == (b,)
    for i in range(b):
        assert np.all(out[i, int(cnt[i]):, 0] == -1.0)


def test_roi_pool(rng):
    data = rng.integers(-30, 30, (2, 8, 8, 3)).astype(np.int8)
    rois = np.array([[0, 1.0, 1.0, 6.0, 6.0], [1, 0.0, 2.0, 7.0, 7.0]],
                    np.float32)
    _run_both("vision.roi_pool", [data, rois],
              {"pooled_size": (2, 2), "spatial_scale": 1.0})


# -- sparse / random ---------------------------------------------------------

def test_sparse_dense(rng):
    m, k = 5, 8
    dense_w = rng.integers(-9, 9, (m, k)).astype(np.int8)
    dense_w[rng.random((m, k)) < 0.6] = 0
    indptr = [0]
    indices, vals = [], []
    for r in range(m):
        nz = np.nonzero(dense_w[r])[0]
        indices += nz.tolist()
        vals += dense_w[r, nz].tolist()
        indptr.append(len(indices))
    x = rng.integers(-9, 9, (3, k)).astype(np.int8)
    (out,) = _run_both(
        "nn.sparse_dense",
        [x, np.array(vals, np.int8), np.array(indices, np.int32),
         np.array(indptr, np.int32)], {})
    np.testing.assert_array_equal(
        out, x.astype(np.int32) @ dense_w.T.astype(np.int32))


def test_multinomial(rng):
    key = np.array([3, 99], np.uint32)
    probs = np.array([[0.1, 0.7, 0.2], [0.9, 0.05, 0.05]], np.float32)
    outs = _run_both("random.multinomial", [key, probs], {"num_samples": 6})
    assert outs[1].shape == (2, 6)
    assert outs[1].min() >= 0 and outs[1].max() <= 2
    # degenerate distribution is deterministic
    one = np.array([[0.0, 1.0, 0.0]], np.float32)
    outs = _run_both("random.multinomial", [key, one], {"num_samples": 4})
    np.testing.assert_array_equal(outs[1], np.ones((1, 4), np.int32))
