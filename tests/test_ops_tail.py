"""Long-tail ops: numpy oracle vs XLA impl cross-checks."""

import numpy as np
import pytest

import tachikoma_tpu  # noqa: F401  (registers everything)
import tachikoma_tpu.ops.jax_ops  # noqa: F401
from tachikoma_tpu.ir.graph import Node
from tachikoma_tpu.ir.registry import get_op


def _run_both(op, args, attrs, exact=True, rtol=1e-5):
    node = Node("t", op, tuple(f"i{i}" for i in range(len(args))), attrs)
    want = get_op(op).np_impl(*args, node=node)
    got = get_op(op).jax_impl(*args, node=node)
    multi = isinstance(want, list)
    wants = want if multi else [want]
    gots = got if multi else [got]
    for w, g in zip(wants, gots):
        g = np.asarray(g)
        if exact:
            np.testing.assert_array_equal(np.asarray(w), g)
        else:
            np.testing.assert_allclose(np.asarray(w), g, rtol=rtol, atol=1e-5)
    return wants


def test_conv1d(rng):
    x = rng.integers(-10, 10, (2, 12, 6)).astype(np.int8)
    w = rng.integers(-10, 10, (3, 6, 8)).astype(np.int8)
    _run_both("nn.conv1d", [x, w],
              {"strides": (2,), "padding": (1, 1), "out_dtype": "int32"})


def test_conv3d(rng):
    x = rng.integers(-10, 10, (1, 5, 6, 7, 4)).astype(np.int8)
    w = rng.integers(-10, 10, (3, 3, 3, 4, 8)).astype(np.int8)
    _run_both("nn.conv3d", [x, w],
              {"strides": (1, 2, 1), "padding": (1, 1, 1), "out_dtype": "int32"})


def test_scatter_family(rng):
    data = rng.integers(-50, 50, (4, 6)).astype(np.int32)
    idx = rng.integers(0, 4, (2, 6)).astype(np.int32)
    upd = rng.integers(-50, 50, (2, 6)).astype(np.int32)
    _run_both("scatter", [data, idx, upd], {"axis": 0})
    _run_both("scatter_add", [data, idx, upd], {"axis": 0})
    nd_idx = rng.integers(0, 4, (3, 1)).astype(np.int32)
    nd_upd = rng.integers(-50, 50, (3, 6)).astype(np.int32)
    _run_both("scatter_nd", [data, nd_idx, nd_upd], {"mode": "add"})


def test_gather_nd(rng):
    data = rng.standard_normal((4, 5, 6)).astype(np.float32)
    idx = rng.integers(0, 4, (7, 2)).astype(np.int32)
    idx[:, 1] %= 5
    _run_both("gather_nd", [data, idx], {})


def test_einsum(rng):
    a = rng.integers(-10, 10, (3, 4)).astype(np.int8)
    b = rng.integers(-10, 10, (4, 5)).astype(np.int8)
    _run_both("einsum", [a, b], {"equation": "ij,jk->ik"})


def test_cumprod_searchsorted(rng):
    a = rng.integers(1, 3, (3, 5)).astype(np.int32)
    _run_both("cumprod", [a], {"axis": 1})
    seq = np.sort(rng.standard_normal(10).astype(np.float32))
    vals = rng.standard_normal((4,)).astype(np.float32)
    _run_both("searchsorted", [seq, vals], {})
    _run_both("searchsorted", [seq, vals], {"right": True})


def test_unique(rng):
    a = rng.integers(0, 6, 12).astype(np.int32)
    for is_sorted in (True, False):
        outs = _run_both("unique", [a], {"is_sorted": is_sorted,
                                         "return_counts": True})
        n = int(outs[2][0])
        assert sorted(set(a.tolist())) == sorted(outs[0][:n].tolist())


def test_nms(rng):
    boxes = rng.random((2, 8, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + 0.3 * rng.random((2, 8, 2)).astype(np.float32)
    scores = rng.random((2, 8)).astype(np.float32)
    _run_both("vision.non_max_suppression", [boxes, scores],
              {"max_output_size": 4, "iou_threshold": 0.4})


def test_roi_align(rng):
    data = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    rois = np.array([[0, 1.0, 1.0, 6.0, 6.0], [1, 0.0, 0.0, 7.5, 7.5]],
                    np.float32)
    _run_both("vision.roi_align", [data, rois],
              {"pooled_size": (2, 2), "spatial_scale": 1.0, "sample_ratio": 2},
              exact=False)


def test_get_valid_counts(rng):
    data = rng.standard_normal((2, 6, 5)).astype(np.float32)
    _run_both("vision.get_valid_counts", [data], {"score_threshold": 0.0})


def test_yolo_reorg(rng):
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    _run_both("vision.yolo_reorg", [x], {"stride": 2})


def test_threefry(rng):
    key = np.array([7, 42], np.uint32)
    outs = _run_both("random.threefry_generate", [key], {"out_shape": (3, 5)})
    assert outs[1].dtype == np.uint32
    _run_both("random.threefry_split", [key], {})
    _run_both("random.uniform", [key],
              {"out_shape": (16,), "low": -1.0, "high": 2.0}, exact=False)
    _run_both("random.normal", [key], {"out_shape": (16,)}, exact=False,
              rtol=1e-4)


def test_creation_ops(rng):
    _run_both("arange", [], {"start": 2, "stop": 11, "step": 3})
    _run_both("zeros", [], {"shape": (2, 3), "dtype": "int8"})
    _run_both("full", [], {"shape": (2,), "fill_value": 7, "dtype": "int32"})
    a = rng.standard_normal((2, 2)).astype(np.float32)
    _run_both("ones_like", [a], {})
    _run_both("trilu", [a], {"upper": False, "k": 0})
    d = rng.standard_normal((2,)).astype(np.float32)
    _run_both("matrix_set_diag", [a, d], {})


def test_sparse_reverse_window(rng):
    idx = np.array([[0, 1], [2, 3]], np.int32)
    vals = np.array([5.0, 7.0], np.float32)
    _run_both("sparse_to_dense", [idx, vals, np.float32(0)],
              {"output_shape": (3, 4)})
    a = rng.standard_normal((2, 5, 3)).astype(np.float32)
    lens = np.array([3, 5], np.int32)
    _run_both("reverse_sequence", [a, lens], {"seq_axis": 1, "batch_axis": 0})
    x = rng.integers(-9, 9, (6, 8)).astype(np.int32)
    _run_both("sliding_window", [x],
              {"axis": 0, "window_shape": (3,), "strides": (2,)})


def test_losses_pools(rng):
    pred = np.abs(rng.standard_normal((4, 10))).astype(np.float32) + 0.1
    pred /= pred.sum(-1, keepdims=True)
    tgt = np.eye(10, dtype=np.float32)[rng.integers(0, 10, 4)]
    _run_both("nn.cross_entropy", [pred, tgt], {}, exact=False)
    _run_both("nn.nll_loss", [pred, rng.integers(0, 10, 4).astype(np.int32)],
              {}, exact=False)
    x = rng.standard_normal((2, 13, 6)).astype(np.float32)
    _run_both("nn.max_pool1d", [x], {"pool_size": (3,), "strides": (2,),
                                     "padding": (1, 1)})
    x2 = rng.standard_normal((1, 9, 9, 3)).astype(np.float32)
    _run_both("nn.adaptive_max_pool2d", [x2], {"output_size": (3, 3)})
    _run_both("nn.mirror_pad", [x2],
              {"pad_width": [(0, 0), (1, 2), (2, 1), (0, 0)],
               "mode": "SYMMETRIC"})


def test_shape_misc(rng):
    a = rng.standard_normal((3, 4)).astype(np.float32)
    _run_both("shape_of", [a], {})
    _run_both("ndarray_size", [a], {})
    x = np.arange(3).astype(np.float32)
    y = np.arange(4).astype(np.float32)
    _run_both("meshgrid", [x, y], {"indexing": "ij"})
