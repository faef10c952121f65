"""Operator long tail, batch 2 — tensor *_like/layout ops, 3-D pools and
transposed convs, space/batch transforms, image warp ops, SSD multibox ops,
sparse dense, and fifo_buffer.

Continues closing the op-surface gap against the reference registry
(SURVEY.md §8.1: `src/relay/op/{nn,tensor,image,vision,random}/`): each op
has a numpy oracle and an XLA impl, cross-tested in tests/test_ops_tail2.py.
Semantics follow the reference op definitions (`src/relay/op/tensor/
transform.cc` reshape_like/collapse_sum/strided_set/adv_index,
`src/relay/op/image/{resize.cc,grid_sample.cc,dilation2d.cc}`,
`src/relay/op/vision/multibox_op.cc`, `src/relay/op/nn/sparse.cc`) with this
repo's NHWC/NDHWC layout convention.
"""

from __future__ import annotations

import numpy as np

from ..ir.graph import Node
from ..ir.registry import (TensorType, get_op, infer_rule, jax_impl, np_impl,
                           register_op)
from ..utils import dtypes as dt
from .nn import _pad4, _pair
from .tail import _pad6, _triple


def _jnp():
    import jax.numpy as jnp

    return jnp


# ---------------------------------------------------------------------------
# tensor: *_like / collapse_sum / strided_set / layout_transform / adv_index
# ---------------------------------------------------------------------------

@infer_rule("reshape_like")
def _reshape_like_rel(node: Node, ins):
    return tuple(ins[1][0]), ins[0][1]


@np_impl("reshape_like")
def _reshape_like_np(a, b, *, node: Node):
    return np.ascontiguousarray(a).reshape(b.shape)


@jax_impl("reshape_like")
def _reshape_like_jax(a, b, *, node: Node):
    return a.reshape(b.shape)


@infer_rule("cast_like")
def _cast_like_rel(node: Node, ins):
    return tuple(ins[0][0]), ins[1][1]


@np_impl("cast_like")
def _cast_like_np(a, b, *, node: Node):
    return a.astype(b.dtype)


@jax_impl("cast_like")
def _cast_like_jax(a, b, *, node: Node):
    return a.astype(b.dtype)


def _slice_like_slices(ashape, bshape, axes):
    idx = [slice(None)] * len(ashape)
    axes = range(len(ashape)) if axes is None else [a % len(ashape) for a in axes]
    for ax in axes:
        if ax < len(bshape):
            idx[ax] = slice(0, bshape[ax])
    return tuple(idx)


@infer_rule("slice_like")
def _slice_like_rel(node: Node, ins):
    (ashape, adt), (bshape, _) = ins[0], ins[1]
    idx = _slice_like_slices(ashape, bshape, node.attrs.get("axes"))
    out = [ashape[i] if s == slice(None) else min(s.stop, ashape[i])
           for i, s in enumerate(idx)]
    return tuple(out), adt


@np_impl("slice_like")
def _slice_like_np(a, b, *, node: Node):
    return a[_slice_like_slices(a.shape, b.shape, node.attrs.get("axes"))]


@jax_impl("slice_like")
def _slice_like_jax(a, b, *, node: Node):
    return a[_slice_like_slices(a.shape, b.shape, node.attrs.get("axes"))]


def _collapse(a, target_shape, xp):
    """Sum-reduce `a` down to broadcast-compatible `target_shape`
    (the reverse of broadcasting; `src/relay/op/tensor/reduce.cc`
    CollapseSumLike/CollapseSumTo)."""
    nd_extra = a.ndim - len(target_shape)
    if nd_extra:
        a = a.sum(axis=tuple(range(nd_extra)))
    keep = tuple(i for i, (s, t) in enumerate(zip(a.shape, target_shape))
                 if s != t)
    if keep:
        a = a.sum(axis=keep, keepdims=True)
    return a.reshape(target_shape)


@infer_rule("collapse_sum_like")
def _csl_rel(node: Node, ins):
    return tuple(ins[1][0]), ins[0][1]


@np_impl("collapse_sum_like")
def _csl_np(a, b, *, node: Node):
    return _collapse(a, b.shape, np).astype(a.dtype)


@jax_impl("collapse_sum_like")
def _csl_jax(a, b, *, node: Node):
    return _collapse(a, b.shape, _jnp()).astype(a.dtype)


@infer_rule("collapse_sum_to")
def _cst_rel(node: Node, ins):
    return tuple(node.attrs["shape"]), ins[0][1]


@np_impl("collapse_sum_to")
def _cst_np(a, *, node: Node):
    return _collapse(a, tuple(node.attrs["shape"]), np).astype(a.dtype)


@jax_impl("collapse_sum_to")
def _cst_jax(a, *, node: Node):
    return _collapse(a, tuple(node.attrs["shape"]), _jnp()).astype(a.dtype)


def _strided_set_idx(node: Node, ndim):
    begin = list(node.attrs["begin"])
    end = list(node.attrs["end"])
    strides = list(node.attrs.get("strides") or [1] * len(begin))
    idx = [slice(None)] * ndim
    for i, (b, e, s) in enumerate(zip(begin, end, strides)):
        idx[i] = slice(int(b), int(e), int(s))
    return tuple(idx)


@infer_rule("strided_set")
def _sset_rel(node: Node, ins):
    return tuple(ins[0][0]), ins[0][1]


@np_impl("strided_set")
def _sset_np(a, v, *, node: Node):
    out = a.copy()
    out[_strided_set_idx(node, a.ndim)] = v
    return out


@jax_impl("strided_set")
def _sset_jax(a, v, *, node: Node):
    a = _jnp().asarray(a)
    return a.at[_strided_set_idx(node, a.ndim)].set(v)


def _layout_perm(src: str, dst: str):
    if sorted(src) != sorted(dst):
        raise ValueError(f"layout_transform {src}->{dst}: not a permutation")
    return tuple(src.index(c) for c in dst)


@infer_rule("layout_transform")
def _lt_rel(node: Node, ins):
    (s, dtp) = ins[0]
    perm = _layout_perm(node.attrs["src_layout"], node.attrs["dst_layout"])
    return tuple(s[p] for p in perm), dtp


@np_impl("layout_transform")
def _lt_np(a, *, node: Node):
    perm = _layout_perm(node.attrs["src_layout"], node.attrs["dst_layout"])
    return np.ascontiguousarray(np.transpose(a, perm))


@jax_impl("layout_transform")
def _lt_jax(a, *, node: Node):
    perm = _layout_perm(node.attrs["src_layout"], node.attrs["dst_layout"])
    return _jnp().transpose(a, perm)


@infer_rule("adv_index")
def _advidx_rel(node: Node, ins):
    (ds, ddt) = ins[0]
    idx_shapes = [s for (s, _) in ins[1:]]
    bshape = ()
    for s in idx_shapes:
        bshape = np.broadcast_shapes(bshape, s)
    return tuple(bshape) + tuple(ds[len(idx_shapes):]), ddt


@np_impl("adv_index")
def _advidx_np(a, *idx, node: Node):
    return a[tuple(i.astype(np.int64) for i in idx)]


@jax_impl("adv_index")
def _advidx_jax(a, *idx, node: Node):
    return a[tuple(idx)]


@infer_rule("reinterpret")
def _reint_rel(node: Node, ins):
    (s, sdt) = ins[0]
    odt = node.attrs["dtype"]
    if np.dtype(sdt).itemsize != np.dtype(odt).itemsize:
        raise ValueError("reinterpret requires equal itemsize")
    return tuple(s), odt


def _reint_check(src_dtype, out_dtype):
    if np.dtype(str(src_dtype)).itemsize != np.dtype(out_dtype).itemsize:
        raise ValueError("reinterpret requires equal itemsize")


@np_impl("reinterpret")
def _reint_np(a, *, node: Node):
    _reint_check(a.dtype, node.attrs["dtype"])
    return a.view(node.attrs["dtype"])


@jax_impl("reinterpret")
def _reint_jax(a, *, node: Node):
    import jax

    _reint_check(a.dtype, node.attrs["dtype"])
    return jax.lax.bitcast_convert_type(a, _jnp().dtype(node.attrs["dtype"]))


# ---------------------------------------------------------------------------
# nn: dilate / space_to_batch_nd / batch_to_space_nd / upsampling / fifo
# ---------------------------------------------------------------------------

@infer_rule("nn.dilate")
def _dilate_rel(node: Node, ins):
    (s, dtp) = ins[0]
    st = list(node.attrs["strides"])
    out = [(d - 1) * z + 1 for d, z in zip(s, st)]
    return tuple(out), dtp


def _dilate(a, xp, node):
    st = list(node.attrs["strides"])
    val = node.attrs.get("dilation_value", 0.0)
    out_shape = tuple((d - 1) * z + 1 for d, z in zip(a.shape, st))
    out = xp.full(out_shape, val, dtype=a.dtype)
    idx = tuple(slice(None, None, z) for z in st)
    if xp is np:
        out[idx] = a
        return out
    return out.at[idx].set(a)


@np_impl("nn.dilate")
def _dilate_np(a, *, node: Node):
    return _dilate(a, np, node)


@jax_impl("nn.dilate")
def _dilate_jax(a, *, node: Node):
    return _dilate(a, _jnp(), node)


@infer_rule("nn.space_to_batch_nd")
def _s2b_rel(node: Node, ins):
    (s, dtp) = ins[0]
    blk = list(node.attrs["block_shape"])
    pads = list(node.attrs["paddings"])  # [[b,a],...] per spatial dim
    n = s[0] * int(np.prod(blk))
    spatial = [(s[1 + i] + pads[i][0] + pads[i][1]) // blk[i]
               for i in range(len(blk))]
    return (n, *spatial, *s[1 + len(blk):]), dtp


def _s2b(a, xp, node):
    blk = list(node.attrs["block_shape"])
    pads = list(node.attrs["paddings"])
    m = len(blk)
    pad_width = [(0, 0)] + [tuple(p) for p in pads] + \
        [(0, 0)] * (a.ndim - 1 - m)
    a = xp.pad(a, pad_width)
    n = a.shape[0]
    rest = a.shape[1 + m:]
    # (N, s1/b1, b1, ..., sm/bm, bm, C) -> (b1..bm, N, s1/b1.., C)
    shape = [n]
    for i in range(m):
        shape += [a.shape[1 + i] // blk[i], blk[i]]
    a = a.reshape(shape + list(rest))
    perm = [2 * i + 2 for i in range(m)] + [0] + \
        [2 * i + 1 for i in range(m)] + \
        list(range(1 + 2 * m, a.ndim))
    a = xp.transpose(a, perm)
    return a.reshape([n * int(np.prod(blk))] +
                     [a.shape[m + 1 + i] for i in range(m)] + list(rest))


@np_impl("nn.space_to_batch_nd")
def _s2b_np(a, *, node: Node):
    return _s2b(a, np, node)


@jax_impl("nn.space_to_batch_nd")
def _s2b_jax(a, *, node: Node):
    return _s2b(a, _jnp(), node)


@infer_rule("nn.batch_to_space_nd")
def _b2s_rel(node: Node, ins):
    (s, dtp) = ins[0]
    blk = list(node.attrs["block_shape"])
    crops = list(node.attrs["crops"])
    n = s[0] // int(np.prod(blk))
    spatial = [s[1 + i] * blk[i] - crops[i][0] - crops[i][1]
               for i in range(len(blk))]
    return (n, *spatial, *s[1 + len(blk):]), dtp


def _b2s(a, xp, node):
    blk = list(node.attrs["block_shape"])
    crops = list(node.attrs["crops"])
    m = len(blk)
    bprod = int(np.prod(blk))
    n = a.shape[0] // bprod
    rest = a.shape[1 + m:]
    a = a.reshape(blk + [n] + list(a.shape[1:1 + m]) + list(rest))
    perm = [m]
    for i in range(m):
        perm += [m + 1 + i, i]
    perm += list(range(2 * m + 1, a.ndim))
    a = xp.transpose(a, perm)
    spatial = [a.shape[1 + 2 * i] * a.shape[2 + 2 * i] for i in range(m)]
    a = a.reshape([n] + spatial + list(rest))
    idx = [slice(None)]
    for i in range(m):
        idx.append(slice(crops[i][0], spatial[i] - crops[i][1]))
    return a[tuple(idx)]


@np_impl("nn.batch_to_space_nd")
def _b2s_np(a, *, node: Node):
    return _b2s(a, np, node)


@jax_impl("nn.batch_to_space_nd")
def _b2s_jax(a, *, node: Node):
    return _b2s(a, _jnp(), node)


def _upsample_idx(scale, size, out_size):
    return np.minimum((np.arange(out_size) / scale).astype(np.int64), size - 1)


@infer_rule("nn.upsampling")
def _ups_rel(node: Node, ins):
    (s, dtp) = ins[0]
    n, h, w, c = s
    sh = float(node.attrs.get("scale_h", 1.0))
    sw = float(node.attrs.get("scale_w", 1.0))
    return (n, int(round(h * sh)), int(round(w * sw)), c), dtp


def _ups(a, node):
    n, h, w, c = a.shape
    sh = float(node.attrs.get("scale_h", 1.0))
    sw = float(node.attrs.get("scale_w", 1.0))
    ys = _upsample_idx(sh, h, int(round(h * sh)))
    xs = _upsample_idx(sw, w, int(round(w * sw)))
    return a[:, ys][:, :, xs]


@np_impl("nn.upsampling")
def _ups_np(a, *, node: Node):
    return _ups(a, node)


@jax_impl("nn.upsampling")
def _ups_jax(a, *, node: Node):
    return _ups(a, node)


@infer_rule("nn.upsampling3d")
def _ups3_rel(node: Node, ins):
    (s, dtp) = ins[0]
    n, d, h, w, c = s
    sd = float(node.attrs.get("scale_d", 1.0))
    sh = float(node.attrs.get("scale_h", 1.0))
    sw = float(node.attrs.get("scale_w", 1.0))
    return (n, int(round(d * sd)), int(round(h * sh)), int(round(w * sw)),
            c), dtp


def _ups3(a, node):
    n, d, h, w, c = a.shape
    sd = float(node.attrs.get("scale_d", 1.0))
    sh = float(node.attrs.get("scale_h", 1.0))
    sw = float(node.attrs.get("scale_w", 1.0))
    zs = _upsample_idx(sd, d, int(round(d * sd)))
    ys = _upsample_idx(sh, h, int(round(h * sh)))
    xs = _upsample_idx(sw, w, int(round(w * sw)))
    return a[:, zs][:, :, ys][:, :, :, xs]


@np_impl("nn.upsampling3d")
def _ups3_np(a, *, node: Node):
    return _ups3(a, node)


@jax_impl("nn.upsampling3d")
def _ups3_jax(a, *, node: Node):
    return _ups3(a, node)


@infer_rule("nn.fifo_buffer")
def _fifo_rel(node: Node, ins):
    return tuple(ins[1][0]), ins[1][1]


def _fifo(data, buffer, xp, node):
    axis = int(node.attrs.get("axis", 0))
    cat = xp.concatenate([buffer, data], axis=axis)
    idx = [slice(None)] * cat.ndim
    idx[axis] = slice(cat.shape[axis] - buffer.shape[axis], cat.shape[axis])
    return cat[tuple(idx)]


@np_impl("nn.fifo_buffer")
def _fifo_np(data, buffer, *, node: Node):
    return _fifo(data, buffer, np, node)


@jax_impl("nn.fifo_buffer")
def _fifo_jax(data, buffer, *, node: Node):
    return _fifo(data, buffer, _jnp(), node)


# ---------------------------------------------------------------------------
# nn: 3-D pooling + 1-D/3-D adaptive avg + transposed conv 1d/3d
# ---------------------------------------------------------------------------

def _pool3d(name, kind):
    def rel(node, ins):
        (s, dtp) = ins[0]
        n, d, h, w, c = s
        kd, kh, kw = _triple(node.attrs["pool_size"])
        sd, sh, sw = _triple(node.attrs.get("strides", (1, 1, 1)))
        pads = _pad6(node.attrs.get("padding", (0,) * 6))
        od = (d + pads[0] + pads[3] - kd) // sd + 1
        oh = (h + pads[1] + pads[4] - kh) // sh + 1
        ow = (w + pads[2] + pads[5] - kw) // sw + 1
        return (n, od, oh, ow, c), dtp

    def np_i(x, *, node):
        kd, kh, kw = _triple(node.attrs["pool_size"])
        sd, sh, sw = _triple(node.attrs.get("strides", (1, 1, 1)))
        pads = _pad6(node.attrs.get("padding", (0,) * 6))
        cip = bool(node.attrs.get("count_include_pad", True))
        if kind == "max":
            fill = (dt.qmin(str(x.dtype)) if dt.is_int(str(x.dtype))
                    else -np.inf)
        else:
            fill = 0
        xp = np.pad(x, ((0, 0), (pads[0], pads[3]), (pads[1], pads[4]),
                        (pads[2], pads[5]), (0, 0)),
                    constant_values=np.asarray(fill, x.dtype))
        win = np.lib.stride_tricks.sliding_window_view(
            xp, (kd, kh, kw), axis=(1, 2, 3))[:, ::sd, ::sh, ::sw]
        if kind == "max":
            return win.max(axis=(-3, -2, -1))
        acc = win.astype(np.int64 if dt.is_int(str(x.dtype)) else np.float64)
        s = acc.sum(axis=(-3, -2, -1))
        if cip:
            return (s / (kd * kh * kw)).astype(x.dtype)
        ones = np.pad(np.ones_like(x, np.int64),
                      ((0, 0), (pads[0], pads[3]), (pads[1], pads[4]),
                       (pads[2], pads[5]), (0, 0)))
        cnt = np.lib.stride_tricks.sliding_window_view(
            ones, (kd, kh, kw), axis=(1, 2, 3))[:, ::sd, ::sh, ::sw].sum(
                axis=(-3, -2, -1))
        return (s / cnt).astype(x.dtype)

    def jax_i(x, *, node):
        import jax
        jnp = _jnp()

        kd, kh, kw = _triple(node.attrs["pool_size"])
        sd, sh, sw = _triple(node.attrs.get("strides", (1, 1, 1)))
        pads = _pad6(node.attrs.get("padding", (0,) * 6))
        cip = bool(node.attrs.get("count_include_pad", True))
        dims = (1, kd, kh, kw, 1)
        strides = (1, sd, sh, sw, 1)
        padcfg = ((0, 0), (pads[0], pads[3]), (pads[1], pads[4]),
                  (pads[2], pads[5]), (0, 0))
        if kind == "max":
            init = (dt.qmin(str(x.dtype)) if dt.is_int(str(x.dtype))
                    else -jnp.inf)
            return jax.lax.reduce_window(
                x, jnp.asarray(init, x.dtype), jax.lax.max, dims, strides,
                padcfg)
        acc_dt = jnp.int32 if dt.is_int(str(x.dtype)) else jnp.float32
        s = jax.lax.reduce_window(
            x.astype(acc_dt), jnp.asarray(0, acc_dt), jax.lax.add, dims,
            strides, padcfg)
        if cip:
            return (s / (kd * kh * kw)).astype(x.dtype)
        cnt = jax.lax.reduce_window(
            jnp.ones(x.shape, acc_dt), jnp.asarray(0, acc_dt), jax.lax.add,
            dims, strides, padcfg)
        return (s / cnt).astype(x.dtype)

    register_op(name, infer=rel, np_impl=np_i, jax_impl=jax_i)


_pool3d("nn.max_pool3d", "max")
_pool3d("nn.avg_pool3d", "avg")


def _adaptive_avg(name, ndim):
    """Adaptive average pool over `ndim` spatial dims (integer bin edges,
    matching `nn.adaptive_avg_pool2d`)."""

    def rel(node, ins):
        (s, dtp) = ins[0]
        out_sz = node.attrs["output_size"]
        out_sz = ([int(out_sz)] * ndim if np.isscalar(out_sz)
                  else [int(v) for v in out_sz])
        return (s[0], *out_sz, s[-1]), dtp

    def _edges(in_sz, out_sz):
        return [((i * in_sz) // out_sz, -(-(i + 1) * in_sz // out_sz))
                for i in range(out_sz)]

    def np_i(x, *, node):
        out_sz = node.attrs["output_size"]
        out_sz = ([int(out_sz)] * ndim if np.isscalar(out_sz)
                  else [int(v) for v in out_sz])
        in_sz = x.shape[1:1 + ndim]
        out = x
        for d in range(ndim):
            pieces = [out[(slice(None),) * (1 + d) + (slice(s, e),)].mean(
                axis=1 + d, keepdims=True)
                for (s, e) in _edges(in_sz[d], out_sz[d])]
            out = np.concatenate(pieces, axis=1 + d).astype(x.dtype)
        return out

    def jax_i(x, *, node):
        jnp = _jnp()
        out_sz = node.attrs["output_size"]
        out_sz = ([int(out_sz)] * ndim if np.isscalar(out_sz)
                  else [int(v) for v in out_sz])
        in_sz = x.shape[1:1 + ndim]
        out = x
        for d in range(ndim):
            pieces = [out[(slice(None),) * (1 + d) + (slice(s, e),)].mean(
                axis=1 + d, keepdims=True)
                for (s, e) in _edges(in_sz[d], out_sz[d])]
            out = jnp.concatenate(pieces, axis=1 + d).astype(x.dtype)
        return out

    register_op(name, infer=rel, np_impl=np_i, jax_impl=jax_i)


_adaptive_avg("nn.adaptive_avg_pool1d", 1)
_adaptive_avg("nn.adaptive_avg_pool3d", 3)


@infer_rule("nn.conv1d_transpose")
def _c1dt_rel(node: Node, ins):
    (ds, ddt), (ws, wdt) = ins[0], ins[1]
    n, l, cin = ds
    k, wcin, cout = ws
    (s,) = (int(np.atleast_1d(node.attrs.get("strides", (1,)))[0]),)
    pad = np.atleast_1d(node.attrs.get("padding", (0, 0)))
    pl_, pr = (int(pad[0]), int(pad[-1]))
    (op,) = (int(np.atleast_1d(node.attrs.get("output_padding", (0,)))[0]),)
    ol = (l - 1) * s + k - pl_ - pr + op
    odt = node.attrs.get("out_dtype")
    return (n, ol, cout), odt or dt.promote(ddt, wdt)


def _c1dt_shadow(node: Node):
    (s,) = (int(np.atleast_1d(node.attrs.get("strides", (1,)))[0]),)
    pad = np.atleast_1d(node.attrs.get("padding", (0, 0)))
    (op,) = (int(np.atleast_1d(node.attrs.get("output_padding", (0,)))[0]),)
    return node.with_(attrs={
        **{k: v for k, v in node.attrs.items() if k == "out_dtype"},
        "strides": (1, s), "padding": (0, int(pad[0]), 0, int(pad[-1])),
        "output_padding": (0, op),
    })


@np_impl("nn.conv1d_transpose")
def _c1dt_np(x, w, *, node: Node):
    out = get_op("nn.conv2d_transpose").np_impl(
        x[:, None], w[None], node=_c1dt_shadow(node))
    return out[:, 0]


@jax_impl("nn.conv1d_transpose")
def _c1dt_jax(x, w, *, node: Node):
    out = get_op("nn.conv2d_transpose").jax_impl(
        x[:, None], w[None], node=_c1dt_shadow(node))
    return out[:, 0]


@infer_rule("nn.conv3d_transpose")
def _c3dt_rel(node: Node, ins):
    (ds, ddt), (ws, wdt) = ins[0], ins[1]
    n, d, h, w, cin = ds
    kd, kh, kw, wcin, cout = ws
    sd, sh, sw = _triple(node.attrs.get("strides", (1, 1, 1)))
    pads = _pad6(node.attrs.get("padding", (0,) * 6))
    opd, oph, opw = _triple(node.attrs.get("output_padding", (0, 0, 0)))
    od = (d - 1) * sd + kd - pads[0] - pads[3] + opd
    oh = (h - 1) * sh + kh - pads[1] - pads[4] + oph
    ow = (w - 1) * sw + kw - pads[2] - pads[5] + opw
    odt = node.attrs.get("out_dtype")
    return (n, od, oh, ow, cout), odt or dt.promote(ddt, wdt)


def _c3dt_scatter(x, w, node, xp):
    n, d, h, wd, cin = x.shape
    kd, kh, kw, wcin, cout = w.shape
    sd, sh, sw = _triple(node.attrs.get("strides", (1, 1, 1)))
    pads = _pad6(node.attrs.get("padding", (0,) * 6))
    opd, oph, opw = _triple(node.attrs.get("output_padding", (0, 0, 0)))
    integer = dt.is_int(str(x.dtype))
    acc = (np.int64 if xp is np else _jnp().int32) if integer else \
        (np.float64 if xp is np else _jnp().float32)
    od = (d - 1) * sd + kd - pads[0] - pads[3] + opd
    oh = (h - 1) * sh + kh - pads[1] - pads[4] + oph
    ow = (wd - 1) * sw + kw - pads[2] - pads[5] + opw
    full = xp.zeros((n, od + pads[0] + pads[3], oh + pads[1] + pads[4],
                     ow + pads[2] + pads[5], cout), dtype=acc)
    if xp is np:
        prod = np.einsum("ndhwc,zyxck->ndhwzyxk", x.astype(acc),
                         w.astype(acc))
        for ki in range(kd):
            for kj in range(kh):
                for kk in range(kw):
                    full[:, ki: ki + d * sd: sd, kj: kj + h * sh: sh,
                         kk: kk + wd * sw: sw] += prod[:, :, :, :, ki, kj, kk]
    else:
        jnp = _jnp()
        prod = jnp.einsum("ndhwc,zyxck->ndhwzyxk", x.astype(acc),
                          w.astype(acc))
        for ki in range(kd):
            for kj in range(kh):
                for kk in range(kw):
                    full = full.at[:, ki: ki + d * sd: sd,
                                   kj: kj + h * sh: sh,
                                   kk: kk + wd * sw: sw].add(
                        prod[:, :, :, :, ki, kj, kk])
    out = full[:, pads[0]: pads[0] + od, pads[1]: pads[1] + oh,
               pads[2]: pads[2] + ow]
    odt = node.attrs.get("out_dtype")
    if odt:
        return out.astype(odt)
    return out.astype(x.dtype if not integer else
                      (np.int32 if xp is np else _jnp().int32))


@np_impl("nn.conv3d_transpose")
def _c3dt_np(x, w, *, node: Node):
    return _c3dt_scatter(x, w, node, np)


@jax_impl("nn.conv3d_transpose")
def _c3dt_jax(x, w, *, node: Node):
    return _c3dt_scatter(x, w, node, _jnp())


# ---------------------------------------------------------------------------
# image: resize1d/3d, crop_and_resize, affine_grid, grid_sample, dilation2d
# ---------------------------------------------------------------------------

def _nn_idx(out_sz, in_sz):
    return np.minimum((np.arange(out_sz) * in_sz) // out_sz, in_sz - 1)


@infer_rule("image.resize1d")
def _rs1_rel(node: Node, ins):
    (s, dtp) = ins[0]
    n, l, c = s
    (ol,) = (int(np.atleast_1d(node.attrs["size"])[0]),)
    return (n, ol, c), dtp


def _rs1(a, node):
    (ol,) = (int(np.atleast_1d(node.attrs["size"])[0]),)
    method = node.attrs.get("method", "nearest_neighbor")
    if method not in ("nearest_neighbor", "nearest"):
        raise NotImplementedError(f"resize1d method {method}")
    return a[:, _nn_idx(ol, a.shape[1])]


register_op("image.resize1d", np_impl=lambda a, *, node: _rs1(a, node),
            jax_impl=lambda a, *, node: _rs1(a, node))


@infer_rule("image.resize3d")
def _rs3_rel(node: Node, ins):
    (s, dtp) = ins[0]
    n, d, h, w, c = s
    od, oh, ow = _triple(node.attrs["size"])
    return (n, od, oh, ow, c), dtp


def _rs3(a, node):
    od, oh, ow = _triple(node.attrs["size"])
    method = node.attrs.get("method", "nearest_neighbor")
    if method not in ("nearest_neighbor", "nearest"):
        raise NotImplementedError(f"resize3d method {method}")
    n, d, h, w, c = a.shape
    return a[:, _nn_idx(od, d)][:, :, _nn_idx(oh, h)][:, :, :, _nn_idx(ow, w)]


register_op("image.resize3d", np_impl=lambda a, *, node: _rs3(a, node),
            jax_impl=lambda a, *, node: _rs3(a, node))


@infer_rule("image.crop_and_resize")
def _car_rel(node: Node, ins):
    (ds, ddt) = ins[0]
    (bs, _) = ins[1]
    ch, cw = _pair(node.attrs["crop_size"])
    return (bs[0], ch, cw, ds[3]), ddt


def _car(data, boxes, box_indices, xp, node):
    """NHWC crop_and_resize, normalized corner boxes (y1,x1,y2,x2), bilinear
    or nearest (reference: `src/relay/op/image/resize.cc` CropAndResize)."""
    ch, cw = _pair(node.attrs["crop_size"])
    method = node.attrs.get("method", "bilinear")
    ext = float(node.attrs.get("extrapolation_value", 0.0))
    n, h, w, c = data.shape
    nb = boxes.shape[0]
    f32 = np.float32 if xp is np else _jnp().float32
    img = data[box_indices.astype(np.int64 if xp is np else _jnp().int32)]
    y1, x1, y2, x2 = (boxes[:, i].astype(f32) for i in range(4))
    iy = xp.arange(ch, dtype=f32)[None, :]     # (1, ch)
    ix = xp.arange(cw, dtype=f32)[None, :]
    hs = xp.where(xp.asarray(ch > 1), (y2 - y1) * (h - 1) / max(ch - 1, 1),
                  xp.zeros_like(y1))
    ws_ = xp.where(xp.asarray(cw > 1), (x2 - x1) * (w - 1) / max(cw - 1, 1),
                   xp.zeros_like(x1))
    y0 = xp.where(xp.asarray(ch > 1), y1 * (h - 1),
                  0.5 * (y1 + y2) * (h - 1))
    x0 = xp.where(xp.asarray(cw > 1), x1 * (w - 1),
                  0.5 * (x1 + x2) * (w - 1))
    yy = y0[:, None] + iy * hs[:, None]        # (nb, ch)
    xx = x0[:, None] + ix * ws_[:, None]       # (nb, cw)
    inside_y = (yy >= 0) & (yy <= h - 1)
    inside_x = (xx >= 0) & (xx <= w - 1)
    gi = xp.arange(nb)[:, None, None]
    if method in ("nearest_neighbor", "nearest"):
        yn = xp.clip(xp.round(yy), 0, h - 1).astype(
            np.int64 if xp is np else _jnp().int32)
        xn = xp.clip(xp.round(xx), 0, w - 1).astype(
            np.int64 if xp is np else _jnp().int32)
        out = img[gi, yn[:, :, None], xn[:, None, :]]
    else:
        ylo = xp.clip(xp.floor(yy), 0, h - 1)
        xlo = xp.clip(xp.floor(xx), 0, w - 1)
        yhi = xp.clip(ylo + 1, 0, h - 1)
        xhi = xp.clip(xlo + 1, 0, w - 1)
        fy = (xp.clip(yy, 0, h - 1) - ylo)[:, :, None, None]
        fx = (xp.clip(xx, 0, w - 1) - xlo)[:, None, :, None]
        idt = np.int64 if xp is np else _jnp().int32
        ylo, yhi, xlo, xhi = (v.astype(idt) for v in (ylo, yhi, xlo, xhi))
        p00 = img[gi, ylo[:, :, None], xlo[:, None, :]].astype(f32)
        p01 = img[gi, ylo[:, :, None], xhi[:, None, :]].astype(f32)
        p10 = img[gi, yhi[:, :, None], xlo[:, None, :]].astype(f32)
        p11 = img[gi, yhi[:, :, None], xhi[:, None, :]].astype(f32)
        out = (p00 * (1 - fy) * (1 - fx) + p01 * (1 - fy) * fx
               + p10 * fy * (1 - fx) + p11 * fy * fx)
    mask = (inside_y[:, :, None] & inside_x[:, None, :])[..., None]
    out = xp.where(mask, out, xp.asarray(ext, f32))
    return out.astype(data.dtype)


@np_impl("image.crop_and_resize")
def _car_np(data, boxes, box_indices, *, node: Node):
    return _car(data, boxes, box_indices, np, node)


@jax_impl("image.crop_and_resize")
def _car_jax(data, boxes, box_indices, *, node: Node):
    return _car(data, boxes, box_indices, _jnp(), node)


@infer_rule("image.affine_grid")
def _ag_rel(node: Node, ins):
    (ts, tdt) = ins[0]      # (N, 2, 3)
    h, w = _pair(node.attrs["target_shape"])
    return (ts[0], 2, h, w), tdt


def _ag(theta, xp, node):
    """Normalized [-1,1] sampling grid from affine params
    (`src/relay/op/image/grid_sample.cc` AffineGrid)."""
    h, w = _pair(node.attrs["target_shape"])
    f32 = np.float32 if xp is np else _jnp().float32
    ys = xp.linspace(-1.0, 1.0, h).astype(f32)
    xs = xp.linspace(-1.0, 1.0, w).astype(f32)
    gy, gx = xp.meshgrid(ys, xs, indexing="ij")
    ones = xp.ones_like(gx)
    base = xp.stack([gx.reshape(-1), gy.reshape(-1),
                     ones.reshape(-1)])          # (3, h*w)
    out = xp.einsum("nij,jk->nik", theta.astype(f32), base)  # (N,2,h*w)
    return out.reshape(theta.shape[0], 2, h, w).astype(theta.dtype)


@np_impl("image.affine_grid")
def _ag_np(theta, *, node: Node):
    return _ag(theta, np, node)


@jax_impl("image.affine_grid")
def _ag_jax(theta, *, node: Node):
    return _ag(theta, _jnp(), node)


@infer_rule("image.grid_sample")
def _gs_rel(node: Node, ins):
    (ds, ddt) = ins[0]      # NCHW
    (gs, _) = ins[1]        # (N, 2, OH, OW)
    return (ds[0], ds[1], gs[2], gs[3]), ddt


def _gs(data, grid, xp, node):
    """NCHW grid_sample, grid (N,2,OH,OW) with (x, y) in [-1,1]; bilinear or
    nearest, zeros padding (`src/relay/op/image/grid_sample.cc`)."""
    method = node.attrs.get("method", "bilinear")
    align = bool(node.attrs.get("align_corners", True))
    n, c, h, w = data.shape
    f32 = np.float32 if xp is np else _jnp().float32
    idt = np.int64 if xp is np else _jnp().int32
    gx = grid[:, 0].astype(f32)
    gy = grid[:, 1].astype(f32)
    if align:
        fx = (gx + 1) * (w - 1) / 2
        fy = (gy + 1) * (h - 1) / 2
    else:
        fx = ((gx + 1) * w - 1) / 2
        fy = ((gy + 1) * h - 1) / 2
    ni = xp.arange(n)[:, None, None]

    def _fetch(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = xp.clip(yi, 0, h - 1).astype(idt)
        xc = xp.clip(xi, 0, w - 1).astype(idt)
        v = data[ni, :, yc, xc]                  # (n, oh, ow, c)
        return xp.where(valid[..., None], v.astype(f32), xp.asarray(0, f32))

    if method in ("nearest_neighbor", "nearest"):
        out = _fetch(xp.round(fy), xp.round(fx))
    else:
        y0, x0 = xp.floor(fy), xp.floor(fx)
        wy, wx = (fy - y0)[..., None], (fx - x0)[..., None]
        out = (_fetch(y0, x0) * (1 - wy) * (1 - wx)
               + _fetch(y0, x0 + 1) * (1 - wy) * wx
               + _fetch(y0 + 1, x0) * wy * (1 - wx)
               + _fetch(y0 + 1, x0 + 1) * wy * wx)
    return xp.transpose(out, (0, 3, 1, 2)).astype(data.dtype)


@np_impl("image.grid_sample")
def _gs_np(data, grid, *, node: Node):
    return _gs(data, grid, np, node)


@jax_impl("image.grid_sample")
def _gs_jax(data, grid, *, node: Node):
    return _gs(data, grid, _jnp(), node)


@infer_rule("image.dilation2d")
def _dil2_rel(node: Node, ins):
    (ds, ddt), (ws, _) = ins[0], ins[1]
    n, h, w, c = ds
    kh, kw, wc = ws
    sh, sw = _pair(node.attrs.get("strides", (1, 1)))
    pt, pl_, pb, pr = _pad4(node.attrs.get("padding", (0, 0, 0, 0)))
    dh, dw = _pair(node.attrs.get("dilations", (1, 1)))
    oh = (h + pt + pb - ((kh - 1) * dh + 1)) // sh + 1
    ow = (w + pl_ + pr - ((kw - 1) * dw + 1)) // sw + 1
    return (n, oh, ow, c), ddt


def _dil2(data, weight, xp, node):
    """Morphological dilation, NHWC data + (KH,KW,C) weight:
    out = max over taps of (x + w) (`src/relay/op/image/dilation2d.cc`)."""
    sh, sw = _pair(node.attrs.get("strides", (1, 1)))
    pt, pl_, pb, pr = _pad4(node.attrs.get("padding", (0, 0, 0, 0)))
    dh, dw = _pair(node.attrs.get("dilations", (1, 1)))
    n, h, w, c = data.shape
    kh, kw, _ = weight.shape
    is_int = dt.is_int(str(data.dtype))
    fill = dt.qmin(str(data.dtype)) if is_int else -np.inf
    xpad = xp.pad(data, ((0, 0), (pt, pb), (pl_, pr), (0, 0)),
                  constant_values=np.asarray(fill, data.dtype))
    oh = (h + pt + pb - ((kh - 1) * dh + 1)) // sh + 1
    ow = (w + pl_ + pr - ((kw - 1) * dw + 1)) // sw + 1
    acc_dt = np.int64 if (is_int and xp is np) else (
        _jnp().int32 if is_int else (np.float64 if xp is np
                                     else _jnp().float32))
    out = None
    for ki in range(kh):
        for kj in range(kw):
            patch = xpad[:, ki * dh: ki * dh + oh * sh: sh,
                         kj * dw: kj * dw + ow * sw: sw, :]
            v = patch.astype(acc_dt) + weight[ki, kj].astype(acc_dt)
            out = v if out is None else xp.maximum(out, v)
    return out.astype(data.dtype)


@np_impl("image.dilation2d")
def _dil2_np(data, weight, *, node: Node):
    return _dil2(data, weight, np, node)


@jax_impl("image.dilation2d")
def _dil2_jax(data, weight, *, node: Node):
    return _dil2(data, weight, _jnp(), node)


# ---------------------------------------------------------------------------
# vision: multibox_prior / multibox_transform_loc / roi_pool
# ---------------------------------------------------------------------------

@infer_rule("vision.multibox_prior")
def _mbp_rel(node: Node, ins):
    (ds, _) = ins[0]        # NHWC feature map
    sizes = list(node.attrs.get("sizes", (1.0,)))
    ratios = list(node.attrs.get("ratios", (1.0,)))
    per_cell = len(sizes) + len(ratios) - 1
    return (1, ds[1] * ds[2] * per_cell, 4), "float32"


def _mbp(shape_hw, xp, node):
    """SSD anchor boxes (corner format y1,x1,y2,x2 normalized), matching
    `src/relay/op/vision/multibox_op.cc` MultiboxPrior semantics."""
    h, w = shape_hw
    sizes = [float(s) for s in node.attrs.get("sizes", (1.0,))]
    ratios = [float(r) for r in node.attrs.get("ratios", (1.0,))]
    steps = node.attrs.get("steps", (-1.0, -1.0))
    offsets = node.attrs.get("offsets", (0.5, 0.5))
    clip = bool(node.attrs.get("clip", False))
    sy = float(steps[0]) if float(steps[0]) > 0 else 1.0 / h
    sx = float(steps[1]) if float(steps[1]) > 0 else 1.0 / w
    cy = (np.arange(h, dtype=np.float32) + float(offsets[0])) * sy
    cx = (np.arange(w, dtype=np.float32) + float(offsets[1])) * sx
    whs = []
    for k in range(len(sizes) + len(ratios) - 1):
        if k < len(sizes):
            bw = sizes[k] * np.sqrt(ratios[0]) / 2
            bh = sizes[k] / np.sqrt(ratios[0]) / 2
        else:
            r = ratios[k - len(sizes) + 1]
            bw = sizes[0] * np.sqrt(r) / 2
            bh = sizes[0] / np.sqrt(r) / 2
        whs.append((bh, bw))
    out = np.empty((h, w, len(whs), 4), np.float32)
    for k, (bh, bw) in enumerate(whs):
        out[:, :, k, 0] = cy[:, None] - bh
        out[:, :, k, 1] = cx[None, :] - bw
        out[:, :, k, 2] = cy[:, None] + bh
        out[:, :, k, 3] = cx[None, :] + bw
    out = out.reshape(1, -1, 4)
    if clip:
        out = np.clip(out, 0.0, 1.0)
    return out if xp is np else xp.asarray(out)


@np_impl("vision.multibox_prior")
def _mbp_np(data, *, node: Node):
    return _mbp(data.shape[1:3], np, node)


@jax_impl("vision.multibox_prior")
def _mbp_jax(data, *, node: Node):
    return _mbp(data.shape[1:3], _jnp(), node)


@infer_rule("vision.multibox_transform_loc")
def _mbtl_rel(node: Node, ins):
    (cs, _) = ins[0]        # (batch, num_classes, num_anchors)
    b, nc, na = cs
    return [((b, na, 6), "float32"), ((b,), "int32")]


def _mbtl(cls_prob, loc_pred, anchor, xp, node):
    """Decode SSD locations + class scores into (cls, score, y1,x1,y2,x2)
    rows; mirrors MultiboxTransformLoc (`multibox_op.cc`): background is
    class 0, output class ids are shifted down by 1, invalid rows are -1."""
    thr = float(node.attrs.get("threshold", 0.01))
    var = [float(v) for v in node.attrs.get("variances", (0.1, 0.1, 0.2, 0.2))]
    cp = np.asarray(cls_prob, np.float32)
    lp = np.asarray(loc_pred, np.float32)
    an = np.asarray(anchor, np.float32)
    b, nc, na = cp.shape
    out = np.full((b, na, 6), -1.0, np.float32)
    counts = np.zeros((b,), np.int32)
    aw = (an[0, :, 3] - an[0, :, 1])
    ah = (an[0, :, 2] - an[0, :, 0])
    acx = (an[0, :, 1] + an[0, :, 3]) / 2
    acy = (an[0, :, 0] + an[0, :, 2]) / 2
    for i in range(b):
        scores = cp[i, 1:, :]                 # skip background
        cls = scores.argmax(axis=0)
        sc = scores[cls, np.arange(na)]
        valid = sc > thr
        lpi = lp[i].reshape(na, 4)
        dcx = lpi[:, 0] * var[0] * aw + acx
        dcy = lpi[:, 1] * var[1] * ah + acy
        dw = np.exp(lpi[:, 2] * var[2]) * aw / 2
        dh = np.exp(lpi[:, 3] * var[3]) * ah / 2
        k = 0
        for j in range(na):
            if not valid[j]:
                continue
            out[i, k] = (cls[j], sc[j], dcy[j] - dh[j], dcx[j] - dw[j],
                         dcy[j] + dh[j], dcx[j] + dw[j])
            k += 1
        counts[i] = k
    if xp is np:
        return out, counts
    return xp.asarray(out), xp.asarray(counts)


@np_impl("vision.multibox_transform_loc")
def _mbtl_np(cls_prob, loc_pred, anchor, *, node: Node):
    return _mbtl(cls_prob, loc_pred, anchor, np, node)


@jax_impl("vision.multibox_transform_loc")
def _mbtl_jax(cls_prob, loc_pred, anchor, *, node: Node):
    import jax

    out_shapes = (jax.ShapeDtypeStruct(
        (cls_prob.shape[0], cls_prob.shape[2], 6), np.float32),
        jax.ShapeDtypeStruct((cls_prob.shape[0],), np.int32))
    return jax.pure_callback(
        lambda c, l, a: _mbtl(np.asarray(c), np.asarray(l), np.asarray(a),
                              np, node),
        out_shapes, cls_prob, loc_pred, anchor)


@infer_rule("vision.roi_pool")
def _roip_rel(node: Node, ins):
    (ds, ddt), (rs, _) = ins[0], ins[1]
    ph, pw = _pair(node.attrs["pooled_size"])
    return (rs[0], ph, pw, ds[3]), ddt


def _roip(data, rois, xp, node):
    """NHWC max roi_pool; rois rows (batch_idx, x1, y1, x2, y2) scaled by
    spatial_scale (`src/relay/op/vision/rcnn_op.cc` ROIPool)."""
    ph, pw = _pair(node.attrs["pooled_size"])
    scale = float(node.attrs.get("spatial_scale", 1.0))
    d = np.asarray(data)
    r = np.asarray(rois, np.float32)
    n, h, w, c = d.shape
    nr = r.shape[0]
    out = np.empty((nr, ph, pw, c), d.dtype)
    for i in range(nr):
        bi = int(round(float(r[i, 0])))
        x1 = int(round(float(r[i, 1]) * scale))
        y1 = int(round(float(r[i, 2]) * scale))
        x2 = int(round(float(r[i, 3]) * scale))
        y2 = int(round(float(r[i, 4]) * scale))
        rh = max(y2 - y1 + 1, 1)
        rw = max(x2 - x1 + 1, 1)
        for py in range(ph):
            for px in range(pw):
                ys = min(max(y1 + (py * rh) // ph, 0), h)
                ye = min(max(y1 + -(-(py + 1) * rh // ph), 0), h)
                xs = min(max(x1 + (px * rw) // pw, 0), w)
                xe = min(max(x1 + -(-(px + 1) * rw // pw), 0), w)
                if ye <= ys or xe <= xs:
                    out[i, py, px] = 0
                else:
                    out[i, py, px] = d[bi, ys:ye, xs:xe].max(axis=(0, 1))
    return out if xp is np else xp.asarray(out)


@np_impl("vision.roi_pool")
def _roip_np(data, rois, *, node: Node):
    return _roip(data, rois, np, node)


@jax_impl("vision.roi_pool")
def _roip_jax(data, rois, *, node: Node):
    import jax

    out_shape = jax.ShapeDtypeStruct(
        (rois.shape[0], *_pair(node.attrs["pooled_size"]), data.shape[3]),
        data.dtype)
    return jax.pure_callback(
        lambda d, r: _roip(np.asarray(d), np.asarray(r), np, node),
        out_shape, data, rois)


# ---------------------------------------------------------------------------
# nn.sparse_dense (CSR weight)
# ---------------------------------------------------------------------------

@infer_rule("nn.sparse_dense")
def _spd_rel(node: Node, ins):
    (xs, xdt) = ins[0]
    (ips, _) = ins[3]       # indptr (M+1,)
    return (xs[0], ips[0] - 1), xdt


@np_impl("nn.sparse_dense")
def _spd_np(x, w_data, w_indices, w_indptr, *, node: Node):
    m = w_indptr.shape[0] - 1
    acc = np.int64 if dt.is_int(str(x.dtype)) else np.float64
    out = np.zeros((x.shape[0], m), acc)
    for r in range(m):
        s, e = int(w_indptr[r]), int(w_indptr[r + 1])
        cols = w_indices[s:e].astype(np.int64)
        out[:, r] = (x[:, cols].astype(acc)
                     * w_data[s:e].astype(acc)).sum(axis=1)
    return out.astype(x.dtype if not dt.is_int(str(x.dtype)) else np.int32)


@jax_impl("nn.sparse_dense")
def _spd_jax(x, w_data, w_indices, w_indptr, *, node: Node):
    # TPU-native choice: densify the CSR weight (scatter) and hit the MXU —
    # gather/segment loops are the wrong shape for this hardware
    jnp = _jnp()
    m = w_indptr.shape[0] - 1
    k = x.shape[1]
    row_of = jnp.searchsorted(w_indptr, jnp.arange(w_data.shape[0]),
                              side="right") - 1
    dense = jnp.zeros((m, k), w_data.dtype).at[
        row_of, w_indices.astype(jnp.int32)].set(w_data)
    if dt.is_int(str(x.dtype)):
        return jnp.dot(x.astype(jnp.int32), dense.T.astype(jnp.int32),
                       preferred_element_type=jnp.int32)
    return jnp.dot(x, dense.T)


# ---------------------------------------------------------------------------
# random.multinomial
# ---------------------------------------------------------------------------

@infer_rule("random.multinomial")
def _rmn_rel(node: Node, ins):
    (ps, _) = ins[1]        # (..., num_categories)
    n = int(node.attrs.get("num_samples", 1))
    return [(tuple(ins[0][0]), ins[0][1]), (tuple(ps[:-1]) + (n,), "int32")]


def _rmn(key, probs, xp, node):
    """Deterministic counter-PRNG multinomial: thresholds from
    threefry-generated uniforms, inverse-CDF pick (reference:
    `src/relay/op/random/kernel.cc` multinomial)."""
    from .tail import _bits_to_unit, _tf_gen_jax, _tf_gen_np

    n = int(node.attrs.get("num_samples", 1))
    lead = probs.shape[:-1]
    shadow = node.with_(attrs={"out_shape": (int(np.prod(lead, dtype=np.int64)) * n,)})
    if xp is np:
        new_key, bits = _tf_gen_np(key, node=shadow)
        u = _bits_to_unit(bits, np).reshape(lead + (n,))
    else:
        new_key, bits = _tf_gen_jax(key, node=shadow)
        u = _bits_to_unit(bits, xp).reshape(lead + (n,))
    p = probs.astype(np.float32 if xp is np else xp.float32)
    p = p / p.sum(axis=-1, keepdims=True)
    cdf = xp.cumsum(p, axis=-1)
    # searchsorted per leading index: compare u against cdf
    idx = (u[..., None] >= cdf[..., None, :]).sum(axis=-1)
    idx = xp.clip(idx, 0, probs.shape[-1] - 1).astype(
        np.int32 if xp is np else xp.int32)
    return new_key, idx


@np_impl("random.multinomial")
def _rmn_np(key, probs, *, node: Node):
    return _rmn(key, probs, np, node)


@jax_impl("random.multinomial")
def _rmn_jax(key, probs, *, node: Node):
    return _rmn(key, probs, _jnp(), node)
