"""Operator long tail — conv1d/3d, scatter/gather_nd, einsum, vision ops,
threefry random, extended pools, and tensor creation ops.

Closes the op-surface gap against the reference registry (SURVEY.md §8.1:
`src/relay/op/{nn,tensor,vision,random}/`): each op has a numpy oracle and
an XLA impl, cross-tested in tests/test_ops_tail.py.  Vision ops mirror the
static-shape TVM semantics (`/root/reference/src/relay/op/vision/nms.cc`,
`rcnn_op.cc` roi_align); random.threefry_* implements the Threefry-2x32
counter PRNG of `src/relay/op/random/kernel.cc` (deterministic integer op —
a natural fit for the bit-exact trace contract).
"""

from __future__ import annotations

import numpy as np

from ..ir.graph import Node
from ..ir.registry import TensorType, infer_rule, jax_impl, np_impl, register_op
from ..utils import dtypes as dt
from .nn import _pad4, _pair, _same_rel, broadcast_shapes


def _jnp():
    import jax.numpy as jnp

    return jnp


# ---------------------------------------------------------------------------
# conv1d / conv3d (+ transposes via conv2d embedding)
# ---------------------------------------------------------------------------

def _conv1d_rel(node: Node, ins):
    (ds, ddt), (ws, wdt) = ins[0], ins[1]
    n, l, cin = ds
    k, wcin, cout = ws
    (s,) = _pair1(node.attrs.get("strides", (1,)))
    pl_, pr = _pad2(node.attrs.get("padding", (0, 0)))
    (d,) = _pair1(node.attrs.get("dilation", (1,)))
    ol = (l + pl_ + pr - ((k - 1) * d + 1)) // s + 1
    return (n, ol, cout), node.attrs.get("out_dtype") or dt.promote(ddt, wdt)


def _pair1(v):
    if isinstance(v, (list, tuple)):
        return (int(v[0]),)
    return (int(v),)


def _pad2(v):
    if isinstance(v, (list, tuple)):
        if len(v) == 1:
            return (int(v[0]), int(v[0]))
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def _conv1d_as_2d_args(node: Node):
    (s,) = _pair1(node.attrs.get("strides", (1,)))
    pl_, pr = _pad2(node.attrs.get("padding", (0, 0)))
    (d,) = _pair1(node.attrs.get("dilation", (1,)))
    shadow = node.with_(attrs={
        **{k: v for k, v in node.attrs.items()
           if k in ("groups", "out_dtype", "input_zero_point", "kernel_zero_point")},
        "strides": (1, s), "padding": (0, pl_, 0, pr), "dilation": (1, d),
    })
    return shadow


@np_impl("nn.conv1d")
def _conv1d_np(x, w, *, node: Node):
    from ..ir.registry import get_op

    shadow = _conv1d_as_2d_args(node)
    out = get_op("nn.conv2d").np_impl(x[:, None], w[None], node=shadow)
    return out[:, 0]


@jax_impl("nn.conv1d")
def _conv1d_jax(x, w, *, node: Node):
    from ..ir.registry import get_op

    shadow = _conv1d_as_2d_args(node)
    return get_op("nn.conv2d").jax_impl(x[:, None], w[None], node=shadow)[:, 0]


register_op("nn.conv1d", infer=_conv1d_rel)


def _conv3d_rel(node: Node, ins):
    (ds, ddt), (ws, wdt) = ins[0], ins[1]
    n, d_, h, w, cin = ds
    kd, kh, kw, wcin, cout = ws
    sd, sh, sw = _triple(node.attrs.get("strides", (1, 1, 1)))
    pads = _pad6(node.attrs.get("padding", (0,) * 6))
    dd, dh, dw = _triple(node.attrs.get("dilation", (1, 1, 1)))
    od = (d_ + pads[0] + pads[3] - ((kd - 1) * dd + 1)) // sd + 1
    oh = (h + pads[1] + pads[4] - ((kh - 1) * dh + 1)) // sh + 1
    ow = (w + pads[2] + pads[5] - ((kw - 1) * dw + 1)) // sw + 1
    return (n, od, oh, ow, cout), node.attrs.get("out_dtype") or dt.promote(ddt, wdt)


def _triple(v):
    if isinstance(v, (list, tuple)):
        if len(v) == 1:
            return (int(v[0]),) * 3
        return tuple(int(x) for x in v)
    return (int(v),) * 3


def _pad6(v):
    v = list(v) if isinstance(v, (list, tuple)) else [v]
    if len(v) == 1:
        return [int(v[0])] * 6
    if len(v) == 3:
        return [int(v[0]), int(v[1]), int(v[2])] * 2
    return [int(x) for x in v]


@np_impl("nn.conv3d")
def _conv3d_np(x, w, *, node: Node):
    # NDHWC x (KD,KH,KW,CIN,COUT) via sliding_window_view + einsum
    sd, sh, sw = _triple(node.attrs.get("strides", (1, 1, 1)))
    pads = _pad6(node.attrs.get("padding", (0,) * 6))
    dd, dh, dw = _triple(node.attrs.get("dilation", (1, 1, 1)))
    assert (dd, dh, dw) == (1, 1, 1), "conv3d oracle: dilation unsupported"
    xp = np.pad(x, ((0, 0), (pads[0], pads[3]), (pads[1], pads[4]),
                    (pads[2], pads[5]), (0, 0)))
    kd, kh, kw, cin, cout = w.shape
    acc = np.int64 if x.dtype.kind in "iu" else np.float64
    win = np.lib.stride_tricks.sliding_window_view(xp, (kd, kh, kw), axis=(1, 2, 3))
    win = win[:, ::sd, ::sh, ::sw]  # (N, OD, OH, OW, C, kd, kh, kw)
    out = np.einsum("nzyxcdhw,dhwck->nzyxk", win.astype(acc), w.astype(acc))
    odt = node.attrs.get("out_dtype")
    if odt:
        return out.astype(odt)
    return out.astype(np.int32 if x.dtype.kind in "iu" else dt.promote(str(x.dtype), str(w.dtype)))


@jax_impl("nn.conv3d")
def _conv3d_jax(x, w, *, node: Node):
    from jax import lax

    jnp = _jnp()
    sd, sh, sw = _triple(node.attrs.get("strides", (1, 1, 1)))
    pads = _pad6(node.attrs.get("padding", (0,) * 6))
    dd, dh, dw = _triple(node.attrs.get("dilation", (1, 1, 1)))
    integer = x.dtype.kind if isinstance(x, np.ndarray) else str(x.dtype)
    is_int = dt.is_int(str(x.dtype))
    pref = jnp.int32 if is_int else jnp.float32
    out = lax.conv_general_dilated(
        x.astype(jnp.int32) if is_int else x,
        w.astype(jnp.int32) if is_int else w,
        window_strides=(sd, sh, sw),
        padding=((pads[0], pads[3]), (pads[1], pads[4]), (pads[2], pads[5])),
        rhs_dilation=(dd, dh, dw),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=pref,
    )
    odt = node.attrs.get("out_dtype")
    return out.astype(jnp.dtype(odt)) if odt else out


register_op("nn.conv3d", infer=_conv3d_rel)


# ---------------------------------------------------------------------------
# scatter family / gather_nd
# ---------------------------------------------------------------------------

@infer_rule("scatter_elements")
def _scatter_rel(node: Node, ins):
    return ins[0]


def _scatter_np_core(data, indices, updates, axis, reduce_):
    out = data.copy()
    idx = indices.astype(np.int64)
    idx = np.where(idx < 0, idx + data.shape[axis], idx)
    if reduce_ == "update":
        np.put_along_axis(out, idx, updates, axis=axis)
    elif reduce_ == "add":
        grid = list(np.meshgrid(*[np.arange(s) for s in idx.shape], indexing="ij"))
        grid[axis] = idx
        np.add.at(out, tuple(grid), updates)
    else:
        raise NotImplementedError(reduce_)
    return out


@np_impl("scatter_elements")
def _scatter_np(data, indices, updates, *, node: Node):
    axis = int(node.attrs.get("axis", 0)) % data.ndim
    return _scatter_np_core(data, indices, updates, axis,
                            node.attrs.get("reduction", "update"))


@jax_impl("scatter_elements")
def _scatter_jax(data, indices, updates, *, node: Node):
    jnp = _jnp()
    data = jnp.asarray(data)
    axis = int(node.attrs.get("axis", 0)) % data.ndim
    idx = indices.astype(jnp.int32)
    idx = jnp.where(idx < 0, idx + data.shape[axis], idx)
    red = node.attrs.get("reduction", "update")
    grids = list(jnp.meshgrid(*[jnp.arange(s) for s in idx.shape], indexing="ij"))
    grids[axis] = idx
    if red == "update":
        return data.at[tuple(grids)].set(updates)
    if red == "add":
        return data.at[tuple(grids)].add(updates)
    raise NotImplementedError(red)


for _n, _r in (("scatter", "update"), ("scatter_add", "add")):
    def _mk(red):
        def np_i(data, indices, updates, *, node):
            axis = int(node.attrs.get("axis", 0)) % data.ndim
            return _scatter_np_core(data, indices, updates, axis, red)

        def jax_i(data, indices, updates, *, node):
            shadow = node.with_(attrs={**dict(node.attrs), "reduction": red})
            return _scatter_jax(data, indices, updates, node=shadow)

        return np_i, jax_i

    _np_i, _jax_i = _mk(_r)
    register_op(_n, infer=lambda node, ins: ins[0], np_impl=_np_i, jax_impl=_jax_i)


@infer_rule("scatter_nd")
def _scatter_nd_rel(node: Node, ins):
    return ins[0]


@np_impl("scatter_nd")
def _scatter_nd_np(data, indices, updates, *, node: Node):
    # indices (..., K) index the first K dims of data; updates (..., rest)
    out = data.copy()
    k = indices.shape[-1]
    flat_idx = indices.reshape(-1, k).astype(np.int64)
    flat_upd = updates.reshape(-1, *data.shape[k:])
    mode = node.attrs.get("mode", "update")
    for i, ix in enumerate(map(tuple, flat_idx)):
        if mode == "add":
            out[ix] = out[ix] + flat_upd[i]
        else:
            out[ix] = flat_upd[i]
    return out


@jax_impl("scatter_nd")
def _scatter_nd_jax(data, indices, updates, *, node: Node):
    jnp = _jnp()
    data = jnp.asarray(data)
    k = indices.shape[-1]
    flat_idx = indices.reshape(-1, k).astype(jnp.int32)
    flat_upd = updates.reshape(-1, *data.shape[k:])
    idx_tuple = tuple(flat_idx[:, i] for i in range(k))
    if node.attrs.get("mode", "update") == "add":
        return data.at[idx_tuple].add(flat_upd)
    return data.at[idx_tuple].set(flat_upd)


@infer_rule("gather_nd")
def _gather_nd_rel(node: Node, ins):
    (ds, ddt), (isx, _) = ins[0], ins[1]
    k = isx[-1]
    return tuple(isx[:-1]) + tuple(ds[k:]), ddt


@np_impl("gather_nd")
def _gather_nd_np(data, indices, *, node: Node):
    k = indices.shape[-1]
    flat = indices.reshape(-1, k).astype(np.int64)
    out = np.stack([data[tuple(ix)] for ix in flat])
    return out.reshape(*indices.shape[:-1], *data.shape[k:])


@jax_impl("gather_nd")
def _gather_nd_jax(data, indices, *, node: Node):
    jnp = _jnp()
    k = indices.shape[-1]
    flat = indices.reshape(-1, k).astype(jnp.int32)
    out = data[tuple(flat[:, i] for i in range(k))]
    return out.reshape(*indices.shape[:-1], *data.shape[k:])


# ---------------------------------------------------------------------------
# einsum / cumprod / searchsorted / unique
# ---------------------------------------------------------------------------

@infer_rule("einsum")
def _einsum_rel(node: Node, ins):
    eq = node.attrs["equation"]
    shapes = [s for (s, _) in ins]
    out = np.einsum(eq, *[np.zeros(s, np.int8) for s in shapes])
    return tuple(out.shape), ins[0][1]


@np_impl("einsum")
def _einsum_np(*args, node: Node):
    acc = np.int64 if args[0].dtype.kind in "iu" else None
    out = np.einsum(node.attrs["equation"],
                    *[a.astype(acc) if acc else a for a in args])
    return out.astype(args[0].dtype if acc is None else
                      node.attrs.get("out_dtype", "int32"))


@jax_impl("einsum")
def _einsum_jax(*args, node: Node):
    jnp = _jnp()
    is_int = dt.is_int(str(args[0].dtype))
    if is_int:
        out = jnp.einsum(node.attrs["equation"],
                         *[a.astype(jnp.int32) for a in args])
        return out.astype(jnp.dtype(node.attrs.get("out_dtype", "int32")))
    return jnp.einsum(node.attrs["equation"], *args)


@infer_rule("cumprod")
def _cumprod_rel(node: Node, ins):
    return ins[0]


@np_impl("cumprod")
def _cumprod_np(a, *, node: Node):
    return np.cumprod(a, axis=node.attrs.get("axis"), dtype=a.dtype)


@jax_impl("cumprod")
def _cumprod_jax(a, *, node: Node):
    return _jnp().cumprod(a, axis=node.attrs.get("axis"), dtype=a.dtype)


@infer_rule("searchsorted")
def _searchsorted_rel(node: Node, ins):
    return tuple(ins[1][0]), node.attrs.get("dtype", "int32")


@np_impl("searchsorted")
def _searchsorted_np(sorted_seq, values, *, node: Node):
    side = "right" if node.attrs.get("right", False) else "left"
    if sorted_seq.ndim == 1:
        out = np.searchsorted(sorted_seq, values, side=side)
    else:
        flat_seq = sorted_seq.reshape(-1, sorted_seq.shape[-1])
        flat_val = values.reshape(-1, values.shape[-1])
        out = np.stack([np.searchsorted(s, v, side=side)
                        for s, v in zip(flat_seq, flat_val)]).reshape(values.shape)
    return out.astype(node.attrs.get("dtype", "int32"))


@jax_impl("searchsorted")
def _searchsorted_jax(sorted_seq, values, *, node: Node):
    import jax

    jnp = _jnp()
    side = "right" if node.attrs.get("right", False) else "left"
    if sorted_seq.ndim == 1:
        out = jnp.searchsorted(sorted_seq, values, side=side)
    else:
        fn = lambda s, v: jnp.searchsorted(s, v, side=side)
        flat_seq = sorted_seq.reshape(-1, sorted_seq.shape[-1])
        flat_val = values.reshape(-1, values.shape[-1])
        out = jax.vmap(fn)(flat_seq, flat_val).reshape(values.shape)
    return out.astype(jnp.dtype(node.attrs.get("dtype", "int32")))


@infer_rule("unique")
def _unique_rel(node: Node, ins):
    (s, dtp) = ins[0]
    n = s[0]
    outs = [(tuple(s), dtp), ((n,), "int32"), ((1,), "int32")]
    if node.attrs.get("return_counts", False):
        outs.append(((n,), "int32"))
    return outs


@np_impl("unique")
def _unique_np(a, *, node: Node):
    """Static-shape unique (TVM semantics, `src/relay/op/tensor/unique.cc`):
    values padded to input length, inverse indices, num_unique scalar."""
    n = a.shape[0]
    uniq, inverse, counts = np.unique(a, return_inverse=True, return_counts=True)
    if node.attrs.get("is_sorted", True):
        order = np.arange(len(uniq))
    else:  # order of first occurrence
        first = np.full(len(uniq), n, np.int64)
        np.minimum.at(first, inverse, np.arange(n))
        order = np.argsort(first, kind="stable")
    remap = np.empty(len(uniq), np.int64)
    remap[order] = np.arange(len(uniq))
    vals = np.zeros(n, a.dtype)
    vals[: len(uniq)] = uniq[order]
    outs = [vals, remap[inverse].astype(np.int32),
            np.array([len(uniq)], np.int32)]
    if node.attrs.get("return_counts", False):
        cnt = np.zeros(n, np.int32)
        cnt[: len(uniq)] = counts[order]
        outs.append(cnt)
    return outs


@jax_impl("unique")
def _unique_jax(a, *, node: Node):
    jnp = _jnp()
    n = a.shape[0]
    uniq, inverse, counts = jnp.unique(
        a, return_inverse=True, return_counts=True, size=n, fill_value=0)
    num = (counts > 0).sum().astype(jnp.int32)
    if not node.attrs.get("is_sorted", True):
        first = jnp.full((n,), n, jnp.int32).at[inverse].min(
            jnp.arange(n, dtype=jnp.int32))
        order = jnp.argsort(jnp.where(counts > 0, first, n), stable=True)
        remap = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
        uniq = uniq[order]
        counts = counts[order]
        inverse = remap[inverse]
    outs = [uniq.astype(a.dtype), inverse.astype(jnp.int32).reshape(n),
            num.reshape(1)]
    if node.attrs.get("return_counts", False):
        outs.append(counts.astype(jnp.int32))
    return outs


# ---------------------------------------------------------------------------
# vision: NMS / roi_align / roi_pool / get_valid_counts / yolo_reorg
# ---------------------------------------------------------------------------

@infer_rule("vision.non_max_suppression")
def _nms_rel(node: Node, ins):
    (bs, _) = ins[0]  # (batch, num_boxes, 4)
    k = int(node.attrs.get("max_output_size", bs[1]))
    return (bs[0], k), "int32"


def _iou(box, boxes):
    # corner format (y1, x1, y2, x2)
    y1 = np.maximum(box[0], boxes[:, 0])
    x1 = np.maximum(box[1], boxes[:, 1])
    y2 = np.minimum(box[2], boxes[:, 2])
    x2 = np.minimum(box[3], boxes[:, 3])
    inter = np.maximum(y2 - y1, 0) * np.maximum(x2 - x1, 0)
    a0 = (box[2] - box[0]) * (box[3] - box[1])
    a1 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.maximum(a0 + a1 - inter, 1e-9)


@np_impl("vision.non_max_suppression")
def _nms_np(boxes, scores, *, node: Node):
    """Per-batch greedy NMS -> top-k selected indices padded with -1
    (static-shape realization of `vision.non_max_suppression`)."""
    bsz, nbox = scores.shape
    k = int(node.attrs.get("max_output_size", nbox))
    iou_thr = float(node.attrs.get("iou_threshold", 0.5))
    score_thr = float(node.attrs.get("score_threshold", -np.inf))
    out = np.full((bsz, k), -1, np.int32)
    for b in range(bsz):
        order = np.argsort(-scores[b], kind="stable")
        kept = []
        for i in order:
            if len(kept) >= k or scores[b, i] <= score_thr:
                break
            if all(_iou(boxes[b, i], boxes[b, np.array(kept)]).max() <= iou_thr
                   for _ in [0]) if kept else True:
                kept.append(i)
        out[b, : len(kept)] = kept
    return out


@jax_impl("vision.non_max_suppression")
def _nms_jax(boxes, scores, *, node: Node):
    """Static-shape greedy NMS via lax.fori_loop (XLA-compilable)."""
    import jax
    from jax import lax

    jnp = _jnp()
    bsz, nbox = scores.shape
    k = int(node.attrs.get("max_output_size", nbox))
    iou_thr = jnp.float32(node.attrs.get("iou_threshold", 0.5))
    score_thr = jnp.float32(node.attrs.get("score_threshold", -np.inf))

    def one(boxes_b, scores_b):
        order = jnp.argsort(-scores_b, stable=True)
        sb = boxes_b[order]
        ss = scores_b[order]
        y1, x1, y2, x2 = sb[:, 0], sb[:, 1], sb[:, 2], sb[:, 3]
        area = (y2 - y1) * (x2 - x1)
        iy1 = jnp.maximum(y1[:, None], y1[None, :])
        ix1 = jnp.maximum(x1[:, None], x1[None, :])
        iy2 = jnp.minimum(y2[:, None], y2[None, :])
        ix2 = jnp.minimum(x2[:, None], x2[None, :])
        inter = jnp.maximum(iy2 - iy1, 0) * jnp.maximum(ix2 - ix1, 0)
        iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)

        def body(i, keep):
            sup = (iou[:, i] > iou_thr) & keep & (jnp.arange(nbox) < i)
            ok = (~sup.any()) & (ss[i] > score_thr)
            return keep.at[i].set(ok)

        keep0 = jnp.zeros(nbox, bool).at[0].set(ss[0] > score_thr)
        keep = lax.fori_loop(1, nbox, body, keep0)
        # position j of the output gets the j-th kept box (original index)
        rank = jnp.cumsum(keep) - 1
        idxs = jnp.where(keep, rank, k).astype(jnp.int32)  # k == out of bounds
        sel = jnp.full((k,), -1, jnp.int32)
        return sel.at[idxs].set(order.astype(jnp.int32), mode="drop")

    return jax.vmap(one)(boxes, scores)


@infer_rule("vision.roi_align")
def _roi_align_rel(node: Node, ins):
    (ds, ddt), (rs, _) = ins[0], ins[1]
    ph, pw = _pair(node.attrs["pooled_size"])
    return (rs[0], ph, pw, ds[3]), ddt


@np_impl("vision.roi_align")
def _roi_align_np(data, rois, *, node: Node):
    """NHWC roi_align with bilinear sampling (avg mode), matching
    `src/relay/op/vision/rcnn_op.cc` / topi roi_align semantics; rois are
    (num_rois, 5): (batch_idx, x1, y1, x2, y2)."""
    ph, pw = _pair(node.attrs["pooled_size"])
    scale = float(node.attrs.get("spatial_scale", 1.0))
    ratio = int(node.attrs.get("sample_ratio", -1))
    n, hh, ww, c = data.shape
    out = np.zeros((rois.shape[0], ph, pw, c), np.float64)

    def bil(b, y, x):
        y = np.clip(y, 0, hh - 1)
        x = np.clip(x, 0, ww - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, hh - 1), min(x0 + 1, ww - 1)
        ly, lx = y - y0, x - x0
        return ((1 - ly) * (1 - lx) * data[b, y0, x0]
                + (1 - ly) * lx * data[b, y0, x1]
                + ly * (1 - lx) * data[b, y1, x0]
                + ly * lx * data[b, y1, x1])

    for r in range(rois.shape[0]):
        b = int(rois[r, 0])
        x1, y1, x2, y2 = [float(v) * scale for v in rois[r, 1:5]]
        rh = max(y2 - y1, 1e-9) / ph
        rw = max(x2 - x1, 1e-9) / pw
        for i in range(ph):
            for j in range(pw):
                sy = ratio if ratio > 0 else int(np.ceil(rh))
                sx = ratio if ratio > 0 else int(np.ceil(rw))
                acc = np.zeros(c, np.float64)
                for iy in range(sy):
                    for ix in range(sx):
                        y = y1 + i * rh + (iy + 0.5) * rh / sy
                        x = x1 + j * rw + (ix + 0.5) * rw / sx
                        acc += bil(b, y, x)
                out[r, i, j] = acc / (sy * sx)
    return out.astype(data.dtype)


@jax_impl("vision.roi_align")
def _roi_align_jax(data, rois, *, node: Node):
    import jax

    jnp = _jnp()
    ph, pw = _pair(node.attrs["pooled_size"])
    scale = jnp.float32(node.attrs.get("spatial_scale", 1.0))
    ratio = int(node.attrs.get("sample_ratio", -1))
    n, hh, ww, c = data.shape

    def bil(img, y, x):
        y = jnp.clip(y, 0, hh - 1)
        x = jnp.clip(x, 0, ww - 1)
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, hh - 1)
        x1 = jnp.minimum(x0 + 1, ww - 1)
        ly, lx = y - y0, x - x0
        return ((1 - ly) * (1 - lx) * img[y0, x0] + (1 - ly) * lx * img[y0, x1]
                + ly * (1 - lx) * img[y1, x0] + ly * lx * img[y1, x1])

    darr = jnp.asarray(data)

    def one(roi):
        b = roi[0].astype(jnp.int32)
        img = darr[b]
        x1, y1, x2, y2 = roi[1] * scale, roi[2] * scale, roi[3] * scale, roi[4] * scale
        rh = jnp.maximum(y2 - y1, 1e-9) / ph
        rw = jnp.maximum(x2 - x1, 1e-9) / pw
        # static sampling grid: sample_ratio must be positive for jit
        sy = sx = ratio if ratio > 0 else 2
        out = jnp.zeros((ph, pw, c), jnp.float32)
        for i in range(ph):
            for j in range(pw):
                acc = jnp.zeros((c,), jnp.float32)
                for iy in range(sy):
                    for ix in range(sx):
                        y = y1 + i * rh + (iy + 0.5) * rh / sy
                        x = x1 + j * rw + (ix + 0.5) * rw / sx
                        acc = acc + bil(img, y, x)
                out = out.at[i, j].set(acc / (sy * sx))
        return out

    return jax.vmap(one)(rois).astype(data.dtype)


@infer_rule("vision.get_valid_counts")
def _gvc_rel(node: Node, ins):
    (ds, ddt) = ins[0]  # (batch, num_anchors, 5+)
    return [((ds[0],), "int32"), (tuple(ds), ddt), ((ds[0], ds[1]), "int32")]


@np_impl("vision.get_valid_counts")
def _gvc_np(data, *, node: Node):
    thr = float(node.attrs.get("score_threshold", 0.0))
    sid = int(node.attrs.get("score_index", 1))
    b, n, e = data.shape
    counts = np.zeros(b, np.int32)
    out = np.full_like(data, -1.0)
    idx = np.full((b, n), -1, np.int32)
    for i in range(b):
        valid = np.where(data[i, :, sid] > thr)[0]
        counts[i] = len(valid)
        out[i, : len(valid)] = data[i, valid]
        idx[i, : len(valid)] = valid
    return [counts, out, idx]


@jax_impl("vision.get_valid_counts")
def _gvc_jax(data, *, node: Node):
    jnp = _jnp()
    thr = jnp.asarray(node.attrs.get("score_threshold", 0.0), data.dtype)
    sid = int(node.attrs.get("score_index", 1))
    b, n, e = data.shape
    valid = data[:, :, sid] > thr                       # (b, n)
    counts = valid.sum(axis=1).astype(jnp.int32)
    order = jnp.argsort(~valid, axis=1, stable=True)    # valid first
    gathered = jnp.take_along_axis(data, order[:, :, None], axis=1)
    pos = jnp.arange(n)[None, :]
    mask = pos < counts[:, None]
    out = jnp.where(mask[:, :, None], gathered, jnp.asarray(-1.0, data.dtype))
    idx = jnp.where(mask, order, -1).astype(jnp.int32)
    return [counts, out, idx]


@infer_rule("vision.yolo_reorg")
def _yolo_rel(node: Node, ins):
    (s, dtp) = ins[0]
    st = int(node.attrs.get("stride", 2))
    n, h, w, c = s
    return (n, h // st, w // st, c * st * st), dtp


@np_impl("vision.yolo_reorg")
def _yolo_np(x, *, node: Node):
    st = int(node.attrs.get("stride", 2))
    n, h, w, c = x.shape
    r = x.reshape(n, h // st, st, w // st, st, c)
    return np.ascontiguousarray(r.transpose(0, 1, 3, 2, 4, 5)).reshape(
        n, h // st, w // st, st * st * c)


@jax_impl("vision.yolo_reorg")
def _yolo_jax(x, *, node: Node):
    jnp = _jnp()
    st = int(node.attrs.get("stride", 2))
    n, h, w, c = x.shape
    r = x.reshape(n, h // st, st, w // st, st, c)
    return jnp.transpose(r, (0, 1, 3, 2, 4, 5)).reshape(
        n, h // st, w // st, st * st * c)


# ---------------------------------------------------------------------------
# random.threefry (deterministic counter PRNG — integer-exact)
# ---------------------------------------------------------------------------

_TF_ROT = (13, 15, 26, 6, 17, 29, 16, 24)
_TF_PARITY = np.uint32(0x1BD11BDA)


def _threefry2x32(key: np.ndarray, counter: np.ndarray, xp=np):
    """Threefry-2x32, 20 rounds (the jax/TVM standard); key (2,) u32,
    counter (2, n) u32 -> (2, n) u32."""
    x0 = counter[0]
    x1 = counter[1]
    ks0, ks1 = key[0], key[1]
    ks2 = _TF_PARITY ^ ks0 ^ ks1
    x0 = x0 + ks0
    x1 = x1 + ks1
    ks = (ks0, ks1, ks2)
    u32 = xp.uint32

    def rot(v, r):
        return (v << u32(r)) | (v >> u32(32 - r))

    for i in range(5):
        for r in range(4):
            x0 = x0 + x1
            x1 = rot(x1, _TF_ROT[(i % 2) * 4 + r])
            x1 = x0 ^ x1
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + u32(i + 1)
    return x0, x1


@infer_rule("random.threefry_generate")
def _tf_gen_rel(node: Node, ins):
    shape = tuple(node.attrs["out_shape"])
    return [(ins[0][0], "uint32"), (shape, "uint32")]


@np_impl("random.threefry_generate")
def _tf_gen_np(key, *, node: Node):
    shape = tuple(node.attrs["out_shape"])
    n = int(np.prod(shape))
    half = (n + 1) // 2
    ctr = np.arange(half, dtype=np.uint64)
    counter = np.stack([(ctr >> 32).astype(np.uint32), ctr.astype(np.uint32)])
    with np.errstate(over="ignore"):
        x0, x1 = _threefry2x32(key.astype(np.uint32), counter)
    bits = np.concatenate([x0, x1])[:n].reshape(shape)
    new_key = np.array([x0[-1] ^ key[0], x1[-1] ^ key[1]], np.uint32) if half else key
    return [new_key.astype(np.uint32), bits.astype(np.uint32)]


@jax_impl("random.threefry_generate")
def _tf_gen_jax(key, *, node: Node):
    jnp = _jnp()
    shape = tuple(node.attrs["out_shape"])
    n = int(np.prod(shape))
    half = (n + 1) // 2
    ctr = jnp.arange(half, dtype=jnp.uint32)
    counter = jnp.stack([jnp.zeros(half, jnp.uint32), ctr])
    x0, x1 = _threefry2x32(key.astype(jnp.uint32), counter, xp=jnp)
    bits = jnp.concatenate([x0, x1])[:n].reshape(shape)
    new_key = jnp.stack([x0[-1] ^ key[0], x1[-1] ^ key[1]])
    return [new_key.astype(jnp.uint32), bits.astype(jnp.uint32)]


@infer_rule("random.threefry_split")
def _tf_split_rel(node: Node, ins):
    return [(ins[0][0], "uint32"), (ins[0][0], "uint32")]


@np_impl("random.threefry_split")
def _tf_split_np(key, *, node: Node):
    with np.errstate(over="ignore"):
        x0, x1 = _threefry2x32(
            key.astype(np.uint32),
            np.stack([np.zeros(2, np.uint32), np.arange(2, dtype=np.uint32)]))
    return [np.stack([x0[0], x1[0]]).astype(np.uint32),
            np.stack([x0[1], x1[1]]).astype(np.uint32)]


@jax_impl("random.threefry_split")
def _tf_split_jax(key, *, node: Node):
    jnp = _jnp()
    x0, x1 = _threefry2x32(
        key.astype(jnp.uint32),
        jnp.stack([jnp.zeros(2, jnp.uint32), jnp.arange(2, dtype=jnp.uint32)]),
        xp=jnp)
    return [jnp.stack([x0[0], x1[0]]), jnp.stack([x0[1], x1[1]])]


@infer_rule("random.uniform")
def _runif_rel(node: Node, ins):
    return tuple(node.attrs["out_shape"]), node.attrs.get("out_dtype", "float32")


def _bits_to_unit(bits, xp):
    # top 24 bits -> [0, 1) float32 (standard unbiased conversion)
    return (bits >> xp.uint32(8)).astype(xp.float32) * xp.float32(1.0 / (1 << 24))


@np_impl("random.uniform")
def _runif_np(key, *, node: Node):
    lo = float(node.attrs.get("low", 0.0))
    hi = float(node.attrs.get("high", 1.0))
    _, bits = _tf_gen_np(key, node=node)
    u = _bits_to_unit(bits, np)
    return (lo + u * (hi - lo)).astype(node.attrs.get("out_dtype", "float32"))


@jax_impl("random.uniform")
def _runif_jax(key, *, node: Node):
    jnp = _jnp()
    lo = float(node.attrs.get("low", 0.0))
    hi = float(node.attrs.get("high", 1.0))
    _, bits = _tf_gen_jax(key, node=node)
    u = _bits_to_unit(bits, jnp)
    return (lo + u * (hi - lo)).astype(jnp.dtype(node.attrs.get("out_dtype", "float32")))


@infer_rule("random.normal")
def _rnorm_rel(node: Node, ins):
    return tuple(node.attrs["out_shape"]), node.attrs.get("out_dtype", "float32")


@np_impl("random.normal")
def _rnorm_np(key, *, node: Node):
    shape = tuple(node.attrs["out_shape"])
    n = int(np.prod(shape))
    shadow = node.with_(attrs={**dict(node.attrs), "out_shape": (2 * n,)})
    _, bits = _tf_gen_np(key, node=shadow)
    u = _bits_to_unit(bits, np).astype(np.float64)
    u1 = np.maximum(u[:n], 1e-12)
    u2 = u[n:]
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    mean = float(node.attrs.get("mean", 0.0))
    scale = float(node.attrs.get("scale", 1.0))
    return (mean + scale * z).reshape(shape).astype(
        node.attrs.get("out_dtype", "float32"))


@jax_impl("random.normal")
def _rnorm_jax(key, *, node: Node):
    jnp = _jnp()
    shape = tuple(node.attrs["out_shape"])
    n = int(np.prod(shape))
    shadow = node.with_(attrs={**dict(node.attrs), "out_shape": (2 * n,)})
    _, bits = _tf_gen_jax(key, node=shadow)
    u = _bits_to_unit(bits, jnp).astype(jnp.float32)
    u1 = jnp.maximum(u[:n], 1e-12)
    u2 = u[n:]
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.float32(np.pi) * u2)
    mean = float(node.attrs.get("mean", 0.0))
    scale = float(node.attrs.get("scale", 1.0))
    return (mean + scale * z).reshape(shape).astype(
        jnp.dtype(node.attrs.get("out_dtype", "float32")))


# ---------------------------------------------------------------------------
# creation / misc tensor ops
# ---------------------------------------------------------------------------

@infer_rule("arange")
def _arange_rel(node: Node, ins):
    start = node.attrs.get("start", 0)
    stop = node.attrs["stop"]
    step = node.attrs.get("step", 1)
    n = max(0, int(np.ceil((stop - start) / step)))
    return (n,), node.attrs.get("dtype", "int32")


@np_impl("arange")
def _arange_np(*, node: Node):
    return np.arange(node.attrs.get("start", 0), node.attrs["stop"],
                     node.attrs.get("step", 1)).astype(node.attrs.get("dtype", "int32"))


@jax_impl("arange")
def _arange_jax(*, node: Node):
    jnp = _jnp()
    return jnp.arange(node.attrs.get("start", 0), node.attrs["stop"],
                      node.attrs.get("step", 1)).astype(
        jnp.dtype(node.attrs.get("dtype", "int32")))


def _creation(name, fill):
    def rel(node, ins):
        return tuple(node.attrs["shape"]), node.attrs.get("dtype", "float32")

    def np_i(*args, node):
        v = node.attrs.get("fill_value", fill) if fill is None else fill
        return np.full(tuple(node.attrs["shape"]), v,
                       node.attrs.get("dtype", "float32"))

    def jax_i(*args, node):
        jnp = _jnp()
        v = node.attrs.get("fill_value", fill) if fill is None else fill
        return jnp.full(tuple(node.attrs["shape"]), v,
                        jnp.dtype(node.attrs.get("dtype", "float32")))

    register_op(name, infer=rel, np_impl=np_i, jax_impl=jax_i)


_creation("zeros", 0)
_creation("ones", 1)
_creation("full", None)


def _like(name, fill):
    def rel(node, ins):
        return ins[0]

    def np_i(a, *rest, node):
        if fill is None:
            return np.full_like(a, node.attrs["fill_value"])
        return np.full_like(a, fill)

    def jax_i(a, *rest, node):
        jnp = _jnp()
        if fill is None:
            return jnp.full_like(a, node.attrs["fill_value"])
        return jnp.full_like(a, fill)

    register_op(name, infer=rel, np_impl=np_i, jax_impl=jax_i)


_like("zeros_like", 0)
_like("ones_like", 1)
_like("full_like", None)


@infer_rule("trilu")
def _trilu_rel(node: Node, ins):
    return ins[0]


@np_impl("trilu")
def _trilu_np(a, *, node: Node):
    k = int(node.attrs.get("k", 0))
    return np.triu(a, k) if node.attrs.get("upper", True) else np.tril(a, k)


@jax_impl("trilu")
def _trilu_jax(a, *, node: Node):
    jnp = _jnp()
    k = int(node.attrs.get("k", 0))
    return jnp.triu(a, k) if node.attrs.get("upper", True) else jnp.tril(a, k)


@infer_rule("matrix_set_diag")
def _msd_rel(node: Node, ins):
    return ins[0]


@np_impl("matrix_set_diag")
def _msd_np(a, diag, *, node: Node):
    out = a.copy()
    n = min(a.shape[-2], a.shape[-1])
    idx = np.arange(n)
    out[..., idx, idx] = diag[..., :n]
    return out


@jax_impl("matrix_set_diag")
def _msd_jax(a, diag, *, node: Node):
    jnp = _jnp()
    a = jnp.asarray(a)
    n = min(a.shape[-2], a.shape[-1])
    idx = jnp.arange(n)
    return a.at[..., idx, idx].set(diag[..., :n])


@infer_rule("sparse_to_dense")
def _std_rel(node: Node, ins):
    return tuple(node.attrs["output_shape"]), ins[1][1]


@np_impl("sparse_to_dense")
def _std_np(indices, values, default, *, node: Node):
    shape = tuple(node.attrs["output_shape"])
    out = np.full(shape, default if np.ndim(default) == 0 else default.item(),
                  values.dtype)
    idx = indices.reshape(-1, indices.shape[-1]) if indices.ndim > 1 else indices.reshape(-1, 1)
    vals = np.broadcast_to(values, (idx.shape[0],) + values.shape[1:]) \
        if values.ndim < idx.shape[0] else values
    for i, ix in enumerate(map(tuple, idx.astype(np.int64))):
        out[ix] = values.reshape(-1)[i] if values.ndim else values
    return out


@jax_impl("sparse_to_dense")
def _std_jax(indices, values, default, *, node: Node):
    jnp = _jnp()
    values = jnp.asarray(values)
    shape = tuple(node.attrs["output_shape"])
    out = jnp.full(shape, default, values.dtype)
    idx = indices.reshape(-1, indices.shape[-1]) if indices.ndim > 1 else indices.reshape(-1, 1)
    vals = jnp.broadcast_to(values.reshape(-1), (idx.shape[0],))
    return out.at[tuple(idx[:, i] for i in range(idx.shape[-1]))].set(vals)


@infer_rule("reverse_sequence")
def _revseq_rel(node: Node, ins):
    return ins[0]


@np_impl("reverse_sequence")
def _revseq_np(a, lengths, *, node: Node):
    saxis = int(node.attrs.get("seq_axis", 1))
    baxis = int(node.attrs.get("batch_axis", 0))
    out = a.copy()
    for b in range(a.shape[baxis]):
        ln = int(lengths[b])
        sl = [slice(None)] * a.ndim
        sl[baxis] = b
        seg = list(sl)
        seg[saxis] = slice(0, ln)
        rev = list(sl)
        rev[saxis] = slice(ln - 1, None, -1) if ln > 0 else slice(0, 0)
        out[tuple(seg)] = a[tuple(rev)]
    return out


@jax_impl("reverse_sequence")
def _revseq_jax(a, lengths, *, node: Node):
    jnp = _jnp()
    saxis = int(node.attrs.get("seq_axis", 1))
    baxis = int(node.attrs.get("batch_axis", 0))
    n = a.shape[saxis]
    pos = jnp.arange(n)
    ln = lengths.astype(jnp.int32)
    # index along seq axis: rev[i] = len-1-i for i < len else i
    shape = [1] * a.ndim
    shape[saxis] = n
    pos_b = pos.reshape(shape)
    lshape = [1] * a.ndim
    lshape[baxis] = a.shape[baxis]
    ln_b = ln.reshape(lshape)
    idx = jnp.where(pos_b < ln_b, ln_b - 1 - pos_b, pos_b)
    return jnp.take_along_axis(a, jnp.broadcast_to(idx, a.shape), axis=saxis)


@infer_rule("sliding_window")
def _slwin_rel(node: Node, ins):
    (s, dtp) = ins[0]
    axis = int(node.attrs["axis"])
    wshape = tuple(node.attrs["window_shape"])
    strides = tuple(node.attrs.get("strides", (1,) * len(wshape)))
    out = list(s[:axis])
    for i, w in enumerate(wshape):
        out.append((s[axis + i] - w) // strides[i] + 1)
    out.extend(wshape)
    out.extend(s[axis + len(wshape):])
    return tuple(out), dtp


@np_impl("sliding_window")
def _slwin_np(a, *, node: Node):
    axis = int(node.attrs["axis"])
    wshape = tuple(node.attrs["window_shape"])
    strides = tuple(node.attrs.get("strides", (1,) * len(wshape)))
    win = np.lib.stride_tricks.sliding_window_view(
        a, wshape, axis=tuple(range(axis, axis + len(wshape))))
    sl = [slice(None)] * win.ndim
    for i, st in enumerate(strides):
        sl[axis + i] = slice(None, None, st)
    win = win[tuple(sl)]
    # sliding_window_view appends window dims at the END; move next to axis
    nw = len(wshape)
    tail = a.ndim - axis - nw
    perm = (list(range(axis + nw)) + list(range(win.ndim - nw, win.ndim))
            + list(range(axis + nw, axis + nw + tail)))
    return np.ascontiguousarray(win.transpose(perm))


@jax_impl("sliding_window")
def _slwin_jax(a, *, node: Node):
    # realized via gather of static window offsets (XLA-friendly)
    jnp = _jnp()
    return jnp.asarray(_slwin_np(np.asarray(a), node=node)) if isinstance(a, np.ndarray) else _slwin_jax_traced(a, node)


def _slwin_jax_traced(a, node):
    from jax import lax

    jnp = _jnp()
    axis = int(node.attrs["axis"])
    wshape = tuple(node.attrs["window_shape"])
    strides = tuple(node.attrs.get("strides", (1,) * len(wshape)))
    outs = []
    counts = [(a.shape[axis + i] - w) // strides[i] + 1 for i, w in enumerate(wshape)]
    import itertools

    for offs in itertools.product(*[range(w) for w in wshape]):
        sl = [slice(None)] * a.ndim
        for i, o in enumerate(offs):
            extent = (counts[i] - 1) * strides[i] + 1
            sl[axis + i] = slice(o, o + extent, strides[i])
        outs.append(a[tuple(sl)])
    stacked = jnp.stack(outs, axis=a.ndim)  # (..., prod(wshape))
    nw = len(wshape)
    tail = a.ndim - axis - nw
    new_shape = (list(a.shape[:axis]) + counts + list(a.shape[axis + nw:])
                 + list(wshape))
    stacked = stacked.reshape(new_shape)
    perm = (list(range(axis + nw)) + list(range(a.ndim, a.ndim + nw))
            + list(range(axis + nw, a.ndim)))
    return jnp.transpose(stacked, perm)


# loss ops -------------------------------------------------------------------

@infer_rule("nn.cross_entropy")
def _ce_rel(node: Node, ins):
    return (), "float32"


@np_impl("nn.cross_entropy")
def _ce_np(pred, target, *, node: Node):
    return np.float32(-np.sum(target * np.log(np.maximum(pred, 1e-30))) / pred.shape[0])


@jax_impl("nn.cross_entropy")
def _ce_jax(pred, target, *, node: Node):
    jnp = _jnp()
    return (-jnp.sum(target * jnp.log(jnp.maximum(pred, 1e-30))) / pred.shape[0]).astype(jnp.float32)


@infer_rule("nn.nll_loss")
def _nll_rel(node: Node, ins):
    return (), "float32"


@np_impl("nn.nll_loss")
def _nll_np(pred, target, *, node: Node):
    n = pred.shape[0]
    return np.float32(-np.mean(pred[np.arange(n), target.astype(np.int64)]))


@jax_impl("nn.nll_loss")
def _nll_jax(pred, target, *, node: Node):
    jnp = _jnp()
    n = pred.shape[0]
    return (-jnp.mean(pred[jnp.arange(n), target.astype(jnp.int32)])).astype(jnp.float32)


# 1d/3d pools ----------------------------------------------------------------

def _pool1d(name, kind):
    def rel(node, ins):
        (s, dtp) = ins[0]
        n, l, c = s
        (k,) = _pair1(node.attrs["pool_size"])
        (st,) = _pair1(node.attrs.get("strides", (1,)))
        pl_, pr = _pad2(node.attrs.get("padding", (0, 0)))
        return (n, (l + pl_ + pr - k) // st + 1, c), dtp

    def _shadow(node):
        (k,) = _pair1(node.attrs["pool_size"])
        (st,) = _pair1(node.attrs.get("strides", (1,)))
        pl_, pr = _pad2(node.attrs.get("padding", (0, 0)))
        return node.with_(attrs={"pool_size": (1, k), "strides": (1, st),
                                 "padding": (0, pl_, 0, pr),
                                 **{kk: vv for kk, vv in node.attrs.items()
                                    if kk in ("count_include_pad", "ceil_mode")}})

    def np_i(x, *, node):
        from ..ir.registry import get_op

        return get_op(f"nn.{kind}_pool2d").np_impl(x[:, None], node=_shadow(node))[:, 0]

    def jax_i(x, *, node):
        from ..ir.registry import get_op

        return get_op(f"nn.{kind}_pool2d").jax_impl(x[:, None], node=_shadow(node))[:, 0]

    register_op(name, infer=rel, np_impl=np_i, jax_impl=jax_i)


_pool1d("nn.max_pool1d", "max")
_pool1d("nn.avg_pool1d", "avg")


@infer_rule("nn.adaptive_max_pool2d")
def _amp_rel(node: Node, ins):
    (s, dtp) = ins[0]
    oh, ow = _pair(node.attrs["output_size"])
    return (s[0], oh, ow, s[3]), dtp


@np_impl("nn.adaptive_max_pool2d")
def _amp_np(x, *, node: Node):
    oh, ow = _pair(node.attrs["output_size"])
    n, h, w, c = x.shape
    out = np.empty((n, oh, ow, c), x.dtype)
    for i in range(oh):
        for j in range(ow):
            hs, he = (i * h) // oh, -(-(i + 1) * h // oh)
            ws, we = (j * w) // ow, -(-(j + 1) * w // ow)
            out[:, i, j] = x[:, hs:he, ws:we].max(axis=(1, 2))
    return out


@jax_impl("nn.adaptive_max_pool2d")
def _amp_jax(x, *, node: Node):
    jnp = _jnp()
    oh, ow = _pair(node.attrs["output_size"])
    n, h, w, c = x.shape
    rows = []
    for i in range(oh):
        cols = []
        for j in range(ow):
            hs, he = (i * h) // oh, -(-(i + 1) * h // oh)
            ws, we = (j * w) // ow, -(-(j + 1) * w // ow)
            cols.append(x[:, hs:he, ws:we].max(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


@infer_rule("nn.mirror_pad")
def _mpad_rel(node: Node, ins):
    (s, dtp) = ins[0]
    widths = node.attrs["pad_width"]
    return tuple(d + int(w[0]) + int(w[1]) for d, w in zip(s, widths)), dtp


@np_impl("nn.mirror_pad")
def _mpad_np(x, *, node: Node):
    mode = node.attrs.get("mode", "SYMMETRIC").lower()
    widths = [tuple(int(v) for v in w) for w in node.attrs["pad_width"]]
    return np.pad(x, widths, mode="symmetric" if mode == "symmetric" else "reflect")


@jax_impl("nn.mirror_pad")
def _mpad_jax(x, *, node: Node):
    jnp = _jnp()
    mode = node.attrs.get("mode", "SYMMETRIC").lower()
    widths = [tuple(int(v) for v in w) for w in node.attrs["pad_width"]]
    return jnp.pad(x, widths, mode="symmetric" if mode == "symmetric" else "reflect")


@infer_rule("shape_of")
def _shapeof_rel(node: Node, ins):
    return (len(ins[0][0]),), node.attrs.get("dtype", "int32")


@np_impl("shape_of")
def _shapeof_np(a, *, node: Node):
    return np.asarray(a.shape, node.attrs.get("dtype", "int32"))


@jax_impl("shape_of")
def _shapeof_jax(a, *, node: Node):
    jnp = _jnp()
    return jnp.asarray(np.asarray(a.shape), jnp.dtype(node.attrs.get("dtype", "int32")))


@infer_rule("ndarray_size")
def _size_rel(node: Node, ins):
    return (), node.attrs.get("dtype", "int32")


@np_impl("ndarray_size")
def _size_np(a, *, node: Node):
    return np.asarray(a.size, node.attrs.get("dtype", "int32"))


@jax_impl("ndarray_size")
def _size_jax(a, *, node: Node):
    jnp = _jnp()
    return jnp.asarray(int(np.prod(a.shape)), jnp.dtype(node.attrs.get("dtype", "int32")))


@infer_rule("meshgrid")
def _meshgrid_rel(node: Node, ins):
    indexing = node.attrs.get("indexing", "ij")
    sizes = [s[0] for (s, _) in ins]
    if indexing == "xy" and len(sizes) >= 2:
        sizes = [sizes[1], sizes[0]] + sizes[2:]
    return [(tuple(sizes), dtp) for (_, dtp) in ins]


@np_impl("meshgrid")
def _meshgrid_np(*args, node: Node):
    return list(np.meshgrid(*args, indexing=node.attrs.get("indexing", "ij")))


@jax_impl("meshgrid")
def _meshgrid_jax(*args, node: Node):
    jnp = _jnp()
    return list(jnp.meshgrid(*args, indexing=node.attrs.get("indexing", "ij")))
