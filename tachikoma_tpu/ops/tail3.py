"""Operator long tail, batch 3 — the final reference-registry gap: training
grads (conv2d_backward_weight), deformable/correlation convs, adaptive max
pools, sparse add/transpose, stft, RPN proposal, and the trunc/floor
division family.

Closes SURVEY.md §8.1 to full named-op coverage: each op has a numpy oracle
and an XLA impl, cross-tested in tests/test_ops_tail3.py.  Semantics follow
the reference op definitions (`src/relay/op/nn/convolution.cc`
conv2d_backward_weight/deformable_conv2d/correlation,
`src/relay/op/nn/sparse.cc` sparse_add/sparse_transpose,
`src/relay/op/tensor/transform.cc` stft, `src/relay/op/vision/rcnn_op.cc`
proposal, `src/relay/op/tensor/binary.cc` floor_mod/trunc_mod/trunc_divide)
with this repo's NHWC layout convention (correlation keeps the reference's
NCHW — it is NCHW-only upstream).
"""

from __future__ import annotations

import numpy as np

from ..ir.graph import Node
from ..ir.registry import infer_rule, jax_impl, np_impl, register_op
from ..utils import dtypes as dt
from .nn import _pad4, _pair


def _jnp():
    import jax.numpy as jnp

    return jnp


# ---------------------------------------------------------------------------
# trunc/floor division family (reference mod is C-style truncated; this
# repo's pre-existing `mod` is numpy floor-mod — floor_mod aliases it)
# ---------------------------------------------------------------------------

def _bin_rel(node: Node, ins):
    (s0, d0), (s1, d1) = ins[0], ins[1]
    return tuple(np.broadcast_shapes(s0, s1)), dt.promote(d0, d1)


def _reg_bin(name, np_fn, jax_fn):
    register_op(
        name, infer=_bin_rel,
        np_impl=lambda a, b, *, node: np_fn(a, b).astype(
            dt.promote(str(a.dtype), str(b.dtype))),
        jax_impl=lambda a, b, *, node: jax_fn(a, b).astype(
            dt.promote(str(a.dtype), str(b.dtype))))


def _np_trunc_div(a, b):
    return np.trunc(np.true_divide(a, b))


def _jax_trunc_div(a, b):
    jnp = _jnp()
    return jnp.trunc(jnp.true_divide(a, b))


def _np_trunc_mod(a, b):
    return np.fmod(a, b)


def _jax_trunc_mod(a, b):
    jnp = _jnp()
    return jnp.fmod(a, b)


_reg_bin("floor_mod", np.mod, lambda a, b: _jnp().mod(a, b))
_reg_bin("trunc_divide", _np_trunc_div, _jax_trunc_div)
_reg_bin("trunc_mod", _np_trunc_mod, _jax_trunc_mod)


@infer_rule("broadcast_to_like")
def _btl_rel(node: Node, ins):
    return tuple(ins[1][0]), ins[0][1]


@np_impl("broadcast_to_like")
def _btl_np(a, b, *, node: Node):
    return np.broadcast_to(a, b.shape).copy()


@jax_impl("broadcast_to_like")
def _btl_jax(a, b, *, node: Node):
    return _jnp().broadcast_to(a, b.shape)


# ---------------------------------------------------------------------------
# nn.cross_entropy_with_logits (pred already log-probabilities)
# ---------------------------------------------------------------------------

@infer_rule("nn.cross_entropy_with_logits")
def _cewl_rel(node: Node, ins):
    return (), "float32"


@np_impl("nn.cross_entropy_with_logits")
def _cewl_np(pred, target, *, node: Node):
    return np.float32(-np.sum(target * pred) / pred.shape[0])


@jax_impl("nn.cross_entropy_with_logits")
def _cewl_jax(pred, target, *, node: Node):
    jnp = _jnp()
    return (-jnp.sum(target * pred) / pred.shape[0]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# adaptive MAX pools (1d/3d; 2d already exists)
# ---------------------------------------------------------------------------

def _adaptive_max(name, ndim):
    def rel(node, ins):
        (s, dtp) = ins[0]
        out_sz = node.attrs["output_size"]
        out_sz = ([int(out_sz)] * ndim if np.isscalar(out_sz)
                  else [int(v) for v in out_sz])
        return (s[0], *out_sz, s[-1]), dtp

    def _edges(in_sz, out_sz):
        return [((i * in_sz) // out_sz, -(-(i + 1) * in_sz // out_sz))
                for i in range(out_sz)]

    def impl(x, xp, node):
        out_sz = node.attrs["output_size"]
        out_sz = ([int(out_sz)] * ndim if np.isscalar(out_sz)
                  else [int(v) for v in out_sz])
        in_sz = x.shape[1:1 + ndim]
        out = x
        for d in range(ndim):
            pieces = [out[(slice(None),) * (1 + d) + (slice(s, e),)].max(
                axis=1 + d, keepdims=True)
                for (s, e) in _edges(in_sz[d], out_sz[d])]
            out = xp.concatenate(pieces, axis=1 + d)
        return out

    register_op(name, infer=rel,
                np_impl=lambda x, *, node: impl(x, np, node),
                jax_impl=lambda x, *, node: impl(x, _jnp(), node))


_adaptive_max("nn.adaptive_max_pool1d", 1)
_adaptive_max("nn.adaptive_max_pool3d", 3)


# ---------------------------------------------------------------------------
# nn.conv2d_backward_weight — the weight gradient of NHWC conv2d
# ---------------------------------------------------------------------------

@infer_rule("nn.conv2d_backward_weight")
def _wgrad_rel(node: Node, ins):
    (gs, gdt), (ds, _) = ins[0], ins[1]
    kh, kw = _pair(node.attrs["kernel_size"])
    odt = node.attrs.get("out_dtype") or "float32"
    return (kh, kw, ds[3], gs[3]), odt


def _wgrad(grad, data, xp, node):
    """wgrad[a,b,ci,co] = sum_{n,oh,ow} data[n,oh*sh+a-pt, ow*sw+b-pl, ci]
    * grad[n,oh,ow,co]  (`src/relay/op/nn/convolution.cc`
    Conv2DBackwardWeight; NHWC/HWIO here)."""
    sh, sw = _pair(node.attrs.get("strides", (1, 1)))
    pt, pl_, pb, pr = _pad4(node.attrs.get("padding", (0, 0, 0, 0)))
    kh, kw = _pair(node.attrs["kernel_size"])
    n, oh, ow, cout = grad.shape
    _, h, w, cin = data.shape
    integer = dt.is_int(str(data.dtype))
    acc = (np.int64 if xp is np else _jnp().int32) if integer else \
        (np.float64 if xp is np else _jnp().float32)
    dpad = xp.pad(data, ((0, 0), (pt, pb), (pl_, pr), (0, 0)))
    g = grad.astype(acc)
    taps = []
    for a in range(kh):
        row = []
        for b in range(kw):
            patch = dpad[:, a: a + oh * sh: sh, b: b + ow * sw: sw, :]
            # (n,oh,ow,ci) x (n,oh,ow,co) -> (ci,co)
            row.append(xp.einsum("nhwc,nhwo->co", patch.astype(acc), g))
        taps.append(xp.stack(row))
    out = xp.stack(taps)                       # (kh,kw,ci,co)
    odt = node.attrs.get("out_dtype") or "float32"
    return out.astype(odt)


@np_impl("nn.conv2d_backward_weight")
def _wgrad_np(grad, data, *, node: Node):
    return _wgrad(grad, data, np, node)


@jax_impl("nn.conv2d_backward_weight")
def _wgrad_jax(grad, data, *, node: Node):
    return _wgrad(grad, data, _jnp(), node)


# ---------------------------------------------------------------------------
# nn.deformable_conv2d — bilinear-offset conv (NHWC data, HWIO weight)
# ---------------------------------------------------------------------------

@infer_rule("nn.deformable_conv2d")
def _dc_rel(node: Node, ins):
    (ds, ddt), (_, _), (ws, wdt) = ins[0], ins[1], ins[2]
    sh, sw = _pair(node.attrs.get("strides", (1, 1)))
    pt, pl_, pb, pr = _pad4(node.attrs.get("padding", (0, 0, 0, 0)))
    dh, dw = _pair(node.attrs.get("dilation", (1, 1)))
    kh, kw, cin, cout = ws
    oh = (ds[1] + pt + pb - ((kh - 1) * dh + 1)) // sh + 1
    ow = (ds[2] + pl_ + pr - ((kw - 1) * dw + 1)) // sw + 1
    odt = node.attrs.get("out_dtype") or dt.promote(ddt, wdt)
    return (ds[0], oh, ow, cout), odt


def _deform_conv(data, offset, weight, xp, node):
    """Deformable conv v1 (`src/relay/op/nn/convolution.cc` DeformableConv2D,
    semantics of mxnet/torchvision deform_conv2d, zero outside-bounds
    sampling).  offset layout: (N, OH, OW, dg*kh*kw*2) with the last axis
    ordered (dg, kh, kw, [dy, dx])."""
    sh, sw = _pair(node.attrs.get("strides", (1, 1)))
    pt, pl_, pb, pr = _pad4(node.attrs.get("padding", (0, 0, 0, 0)))
    dh, dw = _pair(node.attrs.get("dilation", (1, 1)))
    dg = int(node.attrs.get("deformable_groups", 1))
    kh, kw, cin, cout = weight.shape
    n, h, w, _ = data.shape
    _, oh, ow, _ = offset.shape
    f32 = np.float32 if xp is np else _jnp().float32
    idt = np.int64 if xp is np else _jnp().int32
    off = offset.reshape(n, oh, ow, dg, kh, kw, 2).astype(f32)
    cpg = cin // dg
    base_y = (xp.arange(oh) * sh - pt)[None, :, None]     # (1,oh,1)
    base_x = (xp.arange(ow) * sw - pl_)[None, None, :]    # (1,1,ow)
    ni = xp.arange(n)[:, None, None]
    acc = None
    for a in range(kh):
        for b in range(kw):
            for g in range(dg):
                py = base_y + a * dh + off[:, :, :, g, a, b, 0]
                px = base_x + b * dw + off[:, :, :, g, a, b, 1]
                valid = (py > -1) & (py < h) & (px > -1) & (px < w)
                y0 = xp.floor(py)
                x0 = xp.floor(px)
                wy = (py - y0)[..., None]
                wx = (px - x0)[..., None]

                def fetch(yi, xi):
                    ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
                    yc = xp.clip(yi, 0, h - 1).astype(idt)
                    xc = xp.clip(xi, 0, w - 1).astype(idt)
                    v = data[ni, yc, xc, g * cpg:(g + 1) * cpg]
                    return xp.where(ok[..., None], v.astype(f32),
                                    xp.asarray(0, f32))

                samp = (fetch(y0, x0) * (1 - wy) * (1 - wx)
                        + fetch(y0, x0 + 1) * (1 - wy) * wx
                        + fetch(y0 + 1, x0) * wy * (1 - wx)
                        + fetch(y0 + 1, x0 + 1) * wy * wx)
                samp = xp.where(valid[..., None], samp, xp.asarray(0, f32))
                part = xp.einsum("nhwc,co->nhwo", samp,
                                 weight[a, b, g * cpg:(g + 1) * cpg]
                                 .astype(f32))
                acc = part if acc is None else acc + part
    odt = node.attrs.get("out_dtype") or dt.promote(
        str(data.dtype), str(weight.dtype))
    return acc.astype(odt)


@np_impl("nn.deformable_conv2d")
def _dc_np(data, offset, weight, *, node: Node):
    return _deform_conv(data, offset, weight, np, node)


@jax_impl("nn.deformable_conv2d")
def _dc_jax(data, offset, weight, *, node: Node):
    return _deform_conv(data, offset, weight, _jnp(), node)


# ---------------------------------------------------------------------------
# nn.correlation — FlowNet cost volume (NCHW, like the reference)
# ---------------------------------------------------------------------------

@infer_rule("nn.correlation")
def _corr_rel(node: Node, ins):
    (ds, _) = ins[0]
    ks = int(node.attrs["kernel_size"])
    md = int(node.attrs["max_displacement"])
    s1 = int(node.attrs.get("stride1", 1))
    s2 = int(node.attrs.get("stride2", 1))
    pad = int(node.attrs.get("padding", 0))
    n, c, h, w = ds
    pw, ph = w + 2 * pad, h + 2 * pad
    br = (ks - 1) // 2 + md          # border
    q = md // s2 * 2 + 1
    oh = -(-(ph - 2 * br) // s1)
    ow = -(-(pw - 2 * br) // s1)
    return (n, q * q, oh, ow), "float32"


def _correlation(d1, d2, xp, node):
    """Patch correlation (`src/relay/op/nn/correlation.cc`, FlowNet):
    out[n, (dj,di), y, x] = mean_c sum_{patch} d1[..y,x..] * d2 shifted by
    (dj*s2, di*s2); is_multiply=False uses |a-b| instead of a*b."""
    ks = int(node.attrs["kernel_size"])
    md = int(node.attrs["max_displacement"])
    s1 = int(node.attrs.get("stride1", 1))
    s2 = int(node.attrs.get("stride2", 1))
    pad = int(node.attrs.get("padding", 0))
    mul = bool(node.attrs.get("is_multiply", True))
    n, c, h, w = d1.shape
    f32 = np.float32 if xp is np else _jnp().float32
    p1 = xp.pad(d1.astype(f32), ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    p2 = xp.pad(d2.astype(f32), ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    ph, pw = h + 2 * pad, w + 2 * pad
    br = (ks - 1) // 2 + md
    oh = -(-(ph - 2 * br) // s1)
    ow = -(-(pw - 2 * br) // s1)
    kr = (ks - 1) // 2
    dsp = range(-md, md + 1, s2)
    outs = []
    sumelems = ks * ks * c
    for dj in dsp:
        for di in dsp:
            acc = xp.zeros((n, oh, ow), f32)
            for ky in range(-kr, kr + 1):
                for kx in range(-kr, kr + 1):
                    y1 = br + ky
                    x1 = br + kx
                    a = p1[:, :, y1: y1 + oh * s1: s1, x1: x1 + ow * s1: s1]
                    b = p2[:, :, y1 + dj: y1 + dj + oh * s1: s1,
                           x1 + di: x1 + di + ow * s1: s1]
                    v = a * b if mul else xp.abs(a - b)
                    acc = acc + v.sum(axis=1)
            outs.append(acc / sumelems)
    return xp.stack(outs, axis=1)


@np_impl("nn.correlation")
def _corr_np(d1, d2, *, node: Node):
    return _correlation(d1, d2, np, node)


@jax_impl("nn.correlation")
def _corr_jax(d1, d2, *, node: Node):
    return _correlation(d1, d2, _jnp(), node)


# ---------------------------------------------------------------------------
# nn.sparse_add / nn.sparse_transpose (CSR)
# ---------------------------------------------------------------------------

@infer_rule("nn.sparse_add")
def _spa_rel(node: Node, ins):
    return tuple(ins[0][0]), ins[0][1]


def _csr_dense(shape, data, indices, indptr, xp):
    m = indptr.shape[0] - 1
    if xp is np:
        out = np.zeros(shape, data.dtype)
        for r in range(m):
            s, e = int(indptr[r]), int(indptr[r + 1])
            out[r, indices[s:e].astype(np.int64)] = data[s:e]
        return out
    jnp = _jnp()
    row_of = jnp.searchsorted(indptr, jnp.arange(data.shape[0]),
                              side="right") - 1
    return jnp.zeros(shape, data.dtype).at[
        row_of, indices.astype(jnp.int32)].set(data)


@np_impl("nn.sparse_add")
def _spa_np(dense, data, indices, indptr, *, node: Node):
    return dense + _csr_dense(dense.shape, data, indices, indptr, np)


@jax_impl("nn.sparse_add")
def _spa_jax(dense, data, indices, indptr, *, node: Node):
    return dense + _csr_dense(dense.shape, data, indices, indptr, _jnp())


@infer_rule("nn.sparse_transpose")
def _spt_rel(node: Node, ins):
    (dsh, ddt), (ish, idt_), (psh, pdt) = ins[0], ins[1], ins[2]
    return [(tuple(dsh), ddt), (tuple(ish), idt_), (tuple(psh), pdt)]


def _sparse_transpose(data, indices, indptr, n_cols=None):
    """CSR -> CSC-as-CSR (i.e. the CSR of the transpose), stable within a
    column like scipy (`src/relay/op/nn/sparse.cc` SparseTranspose).  The
    transposed row count equals the original indptr length - 1's column
    space; the reference keeps the same indptr LENGTH (square assumption)."""
    m = indptr.shape[0] - 1
    n = m if n_cols is None else n_cols
    order = np.argsort(indices, kind="stable")
    rows = np.repeat(np.arange(m), np.diff(indptr.astype(np.int64)))
    new_data = data[order]
    new_indices = rows[order].astype(indices.dtype)
    counts = np.bincount(indices.astype(np.int64), minlength=n)
    new_indptr = np.zeros(n + 1, indptr.dtype)
    new_indptr[1:] = np.cumsum(counts)
    return new_data, new_indices, new_indptr


@np_impl("nn.sparse_transpose")
def _spt_np(data, indices, indptr, *, node: Node):
    return list(_sparse_transpose(data, indices, indptr))


@jax_impl("nn.sparse_transpose")
def _spt_jax(data, indices, indptr, *, node: Node):
    import jax

    shapes = (jax.ShapeDtypeStruct(data.shape, data.dtype),
              jax.ShapeDtypeStruct(indices.shape, indices.dtype),
              jax.ShapeDtypeStruct(indptr.shape, indptr.dtype))
    out = jax.pure_callback(
        lambda d, i, p: tuple(_sparse_transpose(
            np.asarray(d), np.asarray(i), np.asarray(p))), shapes,
        data, indices, indptr)
    return list(out)


# ---------------------------------------------------------------------------
# stft — TPU-native: windowed frames x DFT matrices (two real matmuls)
# ---------------------------------------------------------------------------

@infer_rule("stft")
def _stft_rel(node: Node, ins):
    (ds, _) = ins[0]
    n_fft = int(node.attrs["n_fft"])
    hop = int(node.attrs.get("hop_length") or n_fft // 4)
    onesided = bool(node.attrs.get("onesided", True))
    freq = n_fft // 2 + 1 if onesided else n_fft
    frames = (ds[-1] - n_fft) // hop + 1
    return tuple(ds[:-1]) + (freq, frames, 2), "float32"


def _stft(data, window, xp, node):
    """Real STFT as two (frames, n_fft) x (n_fft, freq) matmuls with
    cos/-sin DFT bases — the MXU-native formulation (the reference lowers
    torch.stft via TOPI loops; `transform.cc` STFT)."""
    n_fft = int(node.attrs["n_fft"])
    hop = int(node.attrs.get("hop_length") or n_fft // 4)
    onesided = bool(node.attrs.get("onesided", True))
    normalized = bool(node.attrs.get("normalized", False))
    f32 = np.float32 if xp is np else _jnp().float32
    lead = data.shape[:-1]
    length = data.shape[-1]
    frames = (length - n_fft) // hop + 1
    starts = np.arange(frames) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    fr = data.astype(f32)[..., idx]              # (..., frames, n_fft)
    if window is not None:
        fr = fr * window.astype(f32)
    k = np.arange(n_fft // 2 + 1 if onesided else n_fft)
    t = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(t, k) / n_fft   # (n_fft, freq)
    cosb = xp.asarray(np.cos(ang).astype(np.float32))
    sinb = xp.asarray((-np.sin(ang)).astype(np.float32))
    re = fr @ cosb                               # (..., frames, freq)
    im = fr @ sinb
    out = xp.stack([re, im], axis=-1)            # (..., frames, freq, 2)
    out = xp.swapaxes(out, -2, -3)               # (..., freq, frames, 2)
    if normalized:
        out = out / np.float32(np.sqrt(n_fft))
    return out.astype(f32)


@np_impl("stft")
def _stft_np(data, window=None, *, node: Node):
    return _stft(data, window, np, node)


@jax_impl("stft")
def _stft_jax(data, window=None, *, node: Node):
    return _stft(data, window, _jnp(), node)


# ---------------------------------------------------------------------------
# vision.proposal — RPN proposal generation (anchors + deltas + NMS)
# ---------------------------------------------------------------------------

@infer_rule("vision.proposal")
def _prop_rel(node: Node, ins):
    (cs, _) = ins[0]
    post = int(node.attrs.get("rpn_post_nms_top_n", 300))
    return (cs[0] * post, 5), "float32"


def _whctrs(anchor):
    w = anchor[2] - anchor[0] + 1.0
    h = anchor[3] - anchor[1] + 1.0
    return w, h, anchor[0] + 0.5 * (w - 1), anchor[1] + 0.5 * (h - 1)


def _mkanchor(w, h, cx, cy):
    return np.array([cx - 0.5 * (w - 1), cy - 0.5 * (h - 1),
                     cx + 0.5 * (w - 1), cy + 0.5 * (h - 1)], np.float32)


def _gen_anchors(base, ratios, scales):
    """Standard Faster-R-CNN anchor enumeration (ratio first, then scale;
    `src/relay/op/vision/rcnn_op.cc` Proposal / mxnet GenerateAnchor)."""
    base_anchor = np.array([0, 0, base - 1, base - 1], np.float32)
    w, h, cx, cy = _whctrs(base_anchor)
    size = w * h
    out = []
    for r in ratios:
        ws = np.round(np.sqrt(size / r))
        hs = np.round(ws * r)
        for s in scales:
            out.append(_mkanchor(ws * s, hs * s, cx, cy))
    return np.stack(out)


def _proposal(cls_prob, bbox_pred, im_info, node):
    scales = [float(s) for s in node.attrs.get("scales", (4.0, 8.0, 16.0,
                                                          32.0))]
    ratios = [float(r) for r in node.attrs.get("ratios", (0.5, 1.0, 2.0))]
    stride = int(node.attrs.get("feature_stride", 16))
    thr = float(node.attrs.get("threshold", 0.7))
    pre = int(node.attrs.get("rpn_pre_nms_top_n", 6000))
    post = int(node.attrs.get("rpn_post_nms_top_n", 300))
    min_size = int(node.attrs.get("rpn_min_size", 16))
    n, twoa, h, w = cls_prob.shape
    na = twoa // 2
    anchors = _gen_anchors(float(stride), ratios, scales)    # (na,4)
    sy, sx = np.meshgrid(np.arange(h) * stride, np.arange(w) * stride,
                         indexing="ij")
    shift = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    all_anchors = (anchors[None] + shift).reshape(-1, 4)     # (h*w*na, 4)
    out = np.zeros((n * post, 5), np.float32)
    for i in range(n):
        scores = cls_prob[i, na:].reshape(na, h * w).T.reshape(-1)
        deltas = bbox_pred[i].reshape(na, 4, h * w).transpose(2, 0, 1)
        deltas = deltas.reshape(-1, 4)
        ws = all_anchors[:, 2] - all_anchors[:, 0] + 1
        hs = all_anchors[:, 3] - all_anchors[:, 1] + 1
        cx = all_anchors[:, 0] + 0.5 * (ws - 1)
        cy = all_anchors[:, 1] + 0.5 * (hs - 1)
        pcx = deltas[:, 0] * ws + cx
        pcy = deltas[:, 1] * hs + cy
        pw = np.exp(deltas[:, 2]) * ws
        ph = np.exp(deltas[:, 3]) * hs
        boxes = np.stack([pcx - 0.5 * (pw - 1), pcy - 0.5 * (ph - 1),
                          pcx + 0.5 * (pw - 1), pcy + 0.5 * (ph - 1)],
                         axis=1)
        imh, imw = float(im_info[i, 0]), float(im_info[i, 1])
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, imw - 1)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, imh - 1)
        keep = ((boxes[:, 2] - boxes[:, 0] + 1 >= min_size)
                & (boxes[:, 3] - boxes[:, 1] + 1 >= min_size))
        boxes, sc = boxes[keep], scores[keep]
        order = np.argsort(-sc, kind="stable")[:pre]
        boxes, sc = boxes[order], sc[order]
        sel = []
        suppressed = np.zeros(len(sc), bool)
        areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1]
                                                   + 1)
        for j in range(len(sc)):
            if suppressed[j]:
                continue
            sel.append(j)
            if len(sel) >= post:
                break
            xx1 = np.maximum(boxes[j, 0], boxes[j + 1:, 0])
            yy1 = np.maximum(boxes[j, 1], boxes[j + 1:, 1])
            xx2 = np.minimum(boxes[j, 2], boxes[j + 1:, 2])
            yy2 = np.minimum(boxes[j, 3], boxes[j + 1:, 3])
            iw = np.maximum(xx2 - xx1 + 1, 0)
            ih = np.maximum(yy2 - yy1 + 1, 0)
            inter = iw * ih
            iou = inter / (areas[j] + areas[j + 1:] - inter)
            suppressed[j + 1:] |= iou > thr
        for k, j in enumerate(sel):
            out[i * post + k] = (i, *boxes[j])
    return out


@np_impl("vision.proposal")
def _prop_np(cls_prob, bbox_pred, im_info, *, node: Node):
    return _proposal(np.asarray(cls_prob, np.float32),
                     np.asarray(bbox_pred, np.float32),
                     np.asarray(im_info, np.float32), node)


@jax_impl("vision.proposal")
def _prop_jax(cls_prob, bbox_pred, im_info, *, node: Node):
    import jax

    post = int(node.attrs.get("rpn_post_nms_top_n", 300))
    shape = jax.ShapeDtypeStruct((cls_prob.shape[0] * post, 5), np.float32)
    return jax.pure_callback(
        lambda c, b, m: _proposal(np.asarray(c, np.float32),
                                  np.asarray(b, np.float32),
                                  np.asarray(m, np.float32), node),
        shape, cls_prob, bbox_pred, im_info)


# -- dynamic slicing (runtime start indices) ---------------------------------
# The role of the reference's dyn.strided_slice (`src/relay/op/dyn/`) and the
# VM's runtime shape resolution, restricted to the static-SHAPE dynamic-START
# form XLA supports natively (lax.dynamic_slice / dynamic_update_slice):
# slice extents are attrs, start indices are scalar TENSOR inputs (clamped
# like lax so the window always fits).  These are the primitives incremental
# decoding builds KV-cache reads/writes from (models/transformer.py
# gpt2_decode_step).

@infer_rule("dynamic_slice")
def _dyn_slice_rel(node: Node, ins):
    (a, adt) = ins[0]
    sizes = tuple(int(s) for s in node.attrs["sizes"])
    assert len(sizes) == len(a), f"sizes rank {len(sizes)} != data rank {len(a)}"
    assert len(ins) == 1 + len(a), "need one start scalar per dimension"
    return sizes, adt


@np_impl("dynamic_slice")
def _dyn_slice_np(a, *starts, node: Node):
    sizes = [int(s) for s in node.attrs["sizes"]]
    idx = []
    for d, (st, sz) in enumerate(zip(starts, sizes)):
        s = int(np.clip(int(np.asarray(st).reshape(())), 0, a.shape[d] - sz))
        idx.append(slice(s, s + sz))
    return a[tuple(idx)]


@jax_impl("dynamic_slice")
def _dyn_slice_jax(a, *starts, node: Node):
    from jax import lax

    sizes = [int(s) for s in node.attrs["sizes"]]
    return lax.dynamic_slice(a, [s.reshape(()) for s in
                                 (_jnp().asarray(x) for x in starts)], sizes)


@infer_rule("dynamic_update_slice")
def _dyn_upd_rel(node: Node, ins):
    (a, adt) = ins[0]
    (u, udt) = ins[1]
    assert len(u) == len(a), "update rank must match data rank"
    assert udt == adt, f"dtype mismatch {udt} vs {adt}"
    assert len(ins) == 2 + len(a), "need one start scalar per dimension"
    return tuple(a), adt


@np_impl("dynamic_update_slice")
def _dyn_upd_np(a, u, *starts, node: Node):
    out = a.copy()
    idx = []
    for d, st in enumerate(starts):
        s = int(np.clip(int(np.asarray(st).reshape(())), 0,
                        a.shape[d] - u.shape[d]))
        idx.append(slice(s, s + u.shape[d]))
    out[tuple(idx)] = u
    return out


@jax_impl("dynamic_update_slice")
def _dyn_upd_jax(a, u, *starts, node: Node):
    from jax import lax

    return lax.dynamic_update_slice(
        a, u, [s.reshape(()) for s in (_jnp().asarray(x) for x in starts)])
