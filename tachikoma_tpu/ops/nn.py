"""Core op set: type relations + exact numpy oracle implementations.

This is the TPU build's equivalent of the reference's Relay op registry
(`src/relay/op/nn/*.cc`, `src/relay/op/tensor/*.cc` — 214 RELAY_REGISTER_OP
sites) fused with the reference interpreter's semantics
(`src/relay/backend/interpreter.cc`): each op gets a shape/dtype relation and
a numpy implementation that serves as the bit-exact oracle for integer graphs
and the numeric reference for float graphs.

Layout conventions (TPU-first, differs from the reference's NCHW default):
  * conv2d: data NHWC, weight HWIO, out NHWC.  Channels ride the 128-wide
    lane dimension of the VPU/MXU.
  * dense: data (..., K), weight (K, N)  [the reference uses (N, K)].
  * matmul/batch_matmul: (..., M, K) x (..., K, N).
Importers normalize layouts at import time.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

from ..ir.graph import Node
from ..ir.registry import TensorType, infer_rule, np_impl, flops_rule, register_op
from ..utils import dtypes as dt


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def broadcast_shapes(a: Sequence[int], b: Sequence[int]) -> tuple[int, ...]:
    return tuple(int(s) for s in np.broadcast_shapes(tuple(a), tuple(b)))


def _pair(v) -> tuple[int, int]:
    if isinstance(v, (int, np.integer)):
        return (int(v), int(v))
    t = tuple(int(x) for x in v)
    return (t[0], t[0]) if len(t) == 1 else t


def _pad4(v) -> tuple[int, int, int, int]:
    """Normalize padding to (top, left, bottom, right)."""
    if isinstance(v, (int, np.integer)):
        return (int(v),) * 4
    t = tuple(int(x) for x in v)
    if len(t) == 2:
        return (t[0], t[1], t[0], t[1])
    if len(t) == 4:
        return t
    raise ValueError(f"bad padding {v}")


def conv2d_out_hw(h, w, kh, kw, strides, padding, dilation) -> tuple[int, int]:
    sh, sw = _pair(strides)
    dh, dw = _pair(dilation)
    pt, pl, pb, pr = _pad4(padding)
    oh = (h + pt + pb - dh * (kh - 1) - 1) // sh + 1
    ow = (w + pl + pr - dw * (kw - 1) - 1) // sw + 1
    return oh, ow


def _accum_dtype(node: Node, in_dtype: str) -> str:
    out_dtype = node.attrs.get("out_dtype")
    if out_dtype:
        return out_dtype
    return in_dtype


# ---------------------------------------------------------------------------
# conv2d  (reference relation: `src/relay/op/nn/convolution.h` Conv2DRel)
# ---------------------------------------------------------------------------

@infer_rule("nn.conv2d")
def _conv2d_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (dshape, ddt), (wshape, wdt) = ins[0], ins[1]
    n, h, w, cin = dshape
    kh, kw, wcin, cout = wshape
    groups = int(node.attrs.get("groups", 1))
    assert cin == wcin * groups, f"conv2d channel mismatch: {cin} vs {wcin}*{groups}"
    oh, ow = conv2d_out_hw(
        h, w, kh, kw,
        node.attrs.get("strides", (1, 1)),
        node.attrs.get("padding", (0, 0, 0, 0)),
        node.attrs.get("dilation", (1, 1)),
    )
    return (n, oh, ow, cout), _accum_dtype(node, dt.promote(ddt, wdt))


def _im2col(data: np.ndarray, kh, kw, strides, padding, dilation, pad_value=0):
    """NHWC im2col -> (N, OH, OW, KH*KW*C)."""
    n, h, w, c = data.shape
    sh, sw = _pair(strides)
    dh, dw = _pair(dilation)
    pt, pl, pb, pr = _pad4(padding)
    if pt or pl or pb or pr:
        data = np.pad(
            data, ((0, 0), (pt, pb), (pl, pr), (0, 0)), constant_values=pad_value
        )
    oh, ow = conv2d_out_hw(h, w, kh, kw, (sh, sw), (pt, pl, pb, pr), (dh, dw))
    s = data.strides
    windows = np.lib.stride_tricks.as_strided(
        data,
        shape=(n, oh, ow, kh, kw, c),
        strides=(s[0], s[1] * sh, s[2] * sw, s[1] * dh, s[2] * dw, s[3]),
        writeable=False,
    )
    return windows.reshape(n, oh, ow, kh * kw * c), oh, ow


@np_impl("nn.conv2d")
def _conv2d_np(data: np.ndarray, weight: np.ndarray, *, node: Node) -> np.ndarray:
    kh, kw, wcin, cout = weight.shape
    groups = int(node.attrs.get("groups", 1))
    strides = node.attrs.get("strides", (1, 1))
    padding = node.attrs.get("padding", (0, 0, 0, 0))
    dilation = node.attrs.get("dilation", (1, 1))
    out_dtype = node.attrs.get("out_dtype")
    integer = dt.is_int(str(data.dtype))
    acc = np.int64 if integer else np.float32
    cols, oh, ow = _im2col(data.astype(acc), kh, kw, strides, padding, dilation)
    n = data.shape[0]
    cin = data.shape[3]
    if groups == 1:
        out = cols @ weight.reshape(kh * kw * wcin, cout).astype(acc)
    else:
        cpg = cin // groups      # input channels per group
        opg = cout // groups     # output channels per group
        cols_g = cols.reshape(n, oh, ow, kh * kw, cin)
        out = np.empty((n, oh, ow, cout), dtype=acc)
        wflat = weight.astype(acc)
        for g in range(groups):
            patch = cols_g[..., :, g * cpg : (g + 1) * cpg].reshape(n, oh, ow, kh * kw * cpg)
            wg = wflat[:, :, :, g * opg : (g + 1) * opg].reshape(kh * kw * cpg, opg)
            out[..., g * opg : (g + 1) * opg] = patch @ wg
    if out_dtype:
        # Two's-complement truncation: int64 accumulate then cast == int32
        # wraparound accumulation (mod-2^32 arithmetic is associative).
        return out.astype(out_dtype)
    return out.astype(data.dtype if not integer else np.int32)


@flops_rule("nn.conv2d")
def _conv2d_flops(node: Node, ins: Sequence[TensorType]) -> int:
    (dshape, _), (wshape, _) = ins[0], ins[1]
    out_shape, _ = _conv2d_rel(node, ins)
    kh, kw, wcin, cout = wshape
    return 2 * int(np.prod(out_shape)) * kh * kw * wcin


# conv2d_transpose -----------------------------------------------------------

@infer_rule("nn.conv2d_transpose")
def _conv2d_t_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (dshape, ddt), (wshape, wdt) = ins[0], ins[1]
    n, h, w, cin = dshape
    kh, kw, wcin, cout = wshape
    sh, sw = _pair(node.attrs.get("strides", (1, 1)))
    pt, pl, pb, pr = _pad4(node.attrs.get("padding", (0, 0, 0, 0)))
    oph, opw = _pair(node.attrs.get("output_padding", (0, 0)))
    oh = (h - 1) * sh + kh - pt - pb + oph
    ow = (w - 1) * sw + kw - pl - pr + opw
    return (n, oh, ow, cout), _accum_dtype(node, dt.promote(ddt, wdt))


@np_impl("nn.conv2d_transpose")
def _conv2d_t_np(data: np.ndarray, weight: np.ndarray, *, node: Node) -> np.ndarray:
    n, h, w, cin = data.shape
    kh, kw, wcin, cout = weight.shape
    sh, sw = _pair(node.attrs.get("strides", (1, 1)))
    pt, pl, pb, pr = _pad4(node.attrs.get("padding", (0, 0, 0, 0)))
    oph, opw = _pair(node.attrs.get("output_padding", (0, 0)))
    integer = dt.is_int(str(data.dtype))
    acc = np.int64 if integer else np.float32
    oh = (h - 1) * sh + kh - pt - pb + oph
    ow = (w - 1) * sw + kw - pl - pr + opw
    full = np.zeros((n, oh + pt + pb, ow + pl + pr, cout), dtype=acc)
    d = data.astype(acc)
    wf = weight.astype(acc).reshape(kh * kw, wcin, cout)
    prod = np.einsum("nhwc,kco->nhwko", d, wf)  # (n,h,w,kh*kw,cout)
    prod = prod.reshape(n, h, w, kh, kw, cout)
    for ki in range(kh):
        for kj in range(kw):
            full[:, ki : ki + h * sh : sh, kj : kj + w * sw : sw, :] += prod[:, :, :, ki, kj, :]
    out = full[:, pt : pt + oh, pl : pl + ow, :]
    od = node.attrs.get("out_dtype")
    if od:
        return out.astype(od)
    return out.astype(data.dtype if not integer else np.int32)


# dense / matmul -------------------------------------------------------------

@infer_rule("nn.dense")
def _dense_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (dshape, ddt), (wshape, wdt) = ins[0], ins[1]
    k, nout = wshape
    assert dshape[-1] == k, f"dense reduction mismatch {dshape} x {wshape}"
    return tuple(dshape[:-1]) + (nout,), _accum_dtype(node, dt.promote(ddt, wdt))


@np_impl("nn.dense")
def _dense_np(data: np.ndarray, weight: np.ndarray, *, node: Node) -> np.ndarray:
    integer = dt.is_int(str(data.dtype))
    acc = np.int64 if integer else np.float32
    out = data.astype(acc) @ weight.astype(acc)
    od = node.attrs.get("out_dtype")
    if od:
        return out.astype(od)
    return out.astype(data.dtype if not integer else np.int32)


@flops_rule("nn.dense")
def _dense_flops(node: Node, ins: Sequence[TensorType]) -> int:
    (dshape, _), (wshape, _) = ins[0], ins[1]
    return 2 * int(np.prod(dshape)) * wshape[1]


@infer_rule("nn.batch_matmul")
def _bmm_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (a, adt), (b, bdt) = ins[0], ins[1]
    ta = bool(node.attrs.get("transpose_a", False))
    tb = bool(node.attrs.get("transpose_b", False))
    am, ak = (a[-1], a[-2]) if ta else (a[-2], a[-1])
    bk, bn = (b[-1], b[-2]) if tb else (b[-2], b[-1])
    assert ak == bk, f"batch_matmul K mismatch {a} x {b}"
    batch = broadcast_shapes(a[:-2], b[:-2])
    return batch + (am, bn), _accum_dtype(node, dt.promote(adt, bdt))


@np_impl("nn.batch_matmul")
def _bmm_np(a: np.ndarray, b: np.ndarray, *, node: Node) -> np.ndarray:
    integer = dt.is_int(str(a.dtype))
    acc = np.int64 if integer else np.float32
    x = a.astype(acc)
    y = b.astype(acc)
    if node.attrs.get("transpose_a", False):
        x = np.swapaxes(x, -1, -2)
    if node.attrs.get("transpose_b", False):
        y = np.swapaxes(y, -1, -2)
    out = x @ y
    od = node.attrs.get("out_dtype")
    if od:
        return out.astype(od)
    return out.astype(a.dtype if not integer else np.int32)


@flops_rule("nn.batch_matmul")
def _bmm_flops(node: Node, ins: Sequence[TensorType]) -> int:
    out_shape, _ = _bmm_rel(node, ins)
    a, _ = ins[0]
    k = a[-2] if node.attrs.get("transpose_a", False) else a[-1]
    return 2 * int(np.prod(out_shape)) * k


# bias add -------------------------------------------------------------------

@infer_rule("nn.bias_add")
def _bias_add_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (dshape, ddt), (bshape, bdt) = ins[0], ins[1]
    return tuple(dshape), dt.promote(ddt, bdt)


@np_impl("nn.bias_add")
def _bias_add_np(data: np.ndarray, bias: np.ndarray, *, node: Node) -> np.ndarray:
    axis = int(node.attrs.get("axis", -1))
    shape = [1] * data.ndim
    shape[axis] = -1
    return data + bias.reshape(shape).astype(data.dtype)


# pooling --------------------------------------------------------------------

def _pool_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (dshape, ddt) = ins[0]
    n, h, w, c = dshape
    kh, kw = _pair(node.attrs["pool_size"])
    strides = node.attrs.get("strides", (1, 1))
    padding = node.attrs.get("padding", (0, 0, 0, 0))
    sh, sw = _pair(strides)
    pt, pl, pb, pr = _pad4(padding)
    if node.attrs.get("ceil_mode", False):
        oh = -((h + pt + pb - kh) // -sh) + 1
        ow = -((w + pl + pr - kw) // -sw) + 1
    else:
        oh = (h + pt + pb - kh) // sh + 1
        ow = (w + pl + pr - kw) // sw + 1
    return (n, oh, ow, c), ddt


register_op("nn.max_pool2d", infer=_pool_rel)
register_op("nn.avg_pool2d", infer=_pool_rel)


def _pool_windows(data, kh, kw, strides, padding, pad_value, ceil_mode):
    n, h, w, c = data.shape
    sh, sw = _pair(strides)
    pt, pl, pb, pr = _pad4(padding)
    if ceil_mode:
        # extend right/bottom padding so every window fits
        oh = -((h + pt + pb - kh) // -sh) + 1
        ow = -((w + pl + pr - kw) // -sw) + 1
        pb = max(pb, (oh - 1) * sh + kh - h - pt)
        pr = max(pr, (ow - 1) * sw + kw - w - pl)
    padded = np.pad(data, ((0, 0), (pt, pb), (pl, pr), (0, 0)), constant_values=pad_value)
    oh = (h + pt + pb - kh) // sh + 1
    ow = (w + pl + pr - kw) // sw + 1
    s = padded.strides
    return np.lib.stride_tricks.as_strided(
        padded,
        shape=(n, oh, ow, kh, kw, c),
        strides=(s[0], s[1] * sh, s[2] * sw, s[1], s[2], s[3]),
        writeable=False,
    )


@np_impl("nn.max_pool2d")
def _max_pool2d_np(data: np.ndarray, *, node: Node) -> np.ndarray:
    kh, kw = _pair(node.attrs["pool_size"])
    lo = (
        np.iinfo(data.dtype).min
        if dt.is_int(str(data.dtype))
        else -np.inf
    )
    win = _pool_windows(
        data, kh, kw,
        node.attrs.get("strides", (1, 1)),
        node.attrs.get("padding", (0, 0, 0, 0)),
        lo,
        node.attrs.get("ceil_mode", False),
    )
    return win.max(axis=(3, 4))


@np_impl("nn.avg_pool2d")
def _avg_pool2d_np(data: np.ndarray, *, node: Node) -> np.ndarray:
    kh, kw = _pair(node.attrs["pool_size"])
    integer = dt.is_int(str(data.dtype))
    cip = node.attrs.get("count_include_pad", False)
    acc = np.int64 if integer else np.float32
    win = _pool_windows(
        data.astype(acc), kh, kw,
        node.attrs.get("strides", (1, 1)),
        node.attrs.get("padding", (0, 0, 0, 0)),
        0,
        node.attrs.get("ceil_mode", False),
    )
    total = win.sum(axis=(3, 4))
    if cip or _pad4(node.attrs.get("padding", (0, 0, 0, 0))) == (0, 0, 0, 0):
        count = kh * kw
        if integer:
            # reference qnn avg_pool: cast to int32, sum, round-half-away div
            # (TVM pool with int dtype truncates toward -inf via floordiv of
            # positive count after +count/2; we use round-half-away like
            # topi's avg_pool int path: (sum + count/2) // count for
            # positive, matching `avg_pool` int semantics)
            return _int_avg(total, count).astype(data.dtype)
        return (total / count).astype(data.dtype)
    else:
        ones = np.ones(data.shape[1:3] + (1,), dtype=acc)[None]
        cwin = _pool_windows(
            np.broadcast_to(ones, data.shape).astype(acc), kh, kw,
            node.attrs.get("strides", (1, 1)),
            node.attrs.get("padding", (0, 0, 0, 0)),
            0,
            node.attrs.get("ceil_mode", False),
        )
        count = cwin.sum(axis=(3, 4))
        if integer:
            return _int_avg_var(total, count).astype(data.dtype)
        return (total / count).astype(data.dtype)


def _int_avg(total: np.ndarray, count: int) -> np.ndarray:
    # round-half-away-from-zero integer division
    half = count // 2
    return np.where(total >= 0, (total + half) // count, -((-total + half) // count))


def _int_avg_var(total: np.ndarray, count: np.ndarray) -> np.ndarray:
    half = count // 2
    return np.where(total >= 0, (total + half) // count, -((-total + half) // count))


@infer_rule("nn.global_avg_pool2d")
def _gap_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (dshape, ddt) = ins[0]
    n, h, w, c = dshape
    if node.attrs.get("keepdims", True):
        return (n, 1, 1, c), ddt
    return (n, c), ddt


@np_impl("nn.global_avg_pool2d")
def _gap_np(data: np.ndarray, *, node: Node) -> np.ndarray:
    keepdims = node.attrs.get("keepdims", True)
    integer = dt.is_int(str(data.dtype))
    if integer:
        total = data.astype(np.int64).sum(axis=(1, 2), keepdims=keepdims)
        out = _int_avg(total, data.shape[1] * data.shape[2])
        return out.astype(data.dtype)
    out = data.astype(np.float32).mean(axis=(1, 2), keepdims=keepdims)
    return out.astype(data.dtype)


@infer_rule("nn.global_max_pool2d")
def _gmp_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    return _gap_rel(node, ins)


@np_impl("nn.global_max_pool2d")
def _gmp_np(data: np.ndarray, *, node: Node) -> np.ndarray:
    return data.max(axis=(1, 2), keepdims=node.attrs.get("keepdims", True))


@infer_rule("nn.adaptive_avg_pool2d")
def _aap_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (dshape, ddt) = ins[0]
    n, h, w, c = dshape
    oh, ow = _pair(node.attrs["output_size"])
    return (n, oh, ow, c), ddt


@np_impl("nn.adaptive_avg_pool2d")
def _aap_np(data: np.ndarray, *, node: Node) -> np.ndarray:
    n, h, w, c = data.shape
    oh, ow = _pair(node.attrs["output_size"])
    integer = dt.is_int(str(data.dtype))
    acc = np.int64 if integer else np.float32
    out = np.empty((n, oh, ow, c), dtype=acc)
    for i in range(oh):
        h0, h1 = (i * h) // oh, -((-(i + 1) * h) // oh)
        for j in range(ow):
            w0, w1 = (j * w) // ow, -((-(j + 1) * w) // ow)
            patch = data[:, h0:h1, w0:w1, :].astype(acc)
            tot = patch.sum(axis=(1, 2))
            cnt = (h1 - h0) * (w1 - w0)
            out[:, i, j, :] = _int_avg(tot, cnt) if integer else tot / cnt
    return out.astype(data.dtype)


# normalization (inference-mode) --------------------------------------------

@infer_rule("nn.batch_norm")
def _bn_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    return ins[0]


@np_impl("nn.batch_norm")
def _bn_np(data, gamma, beta, mean, var, *, node: Node):
    eps = float(node.attrs.get("epsilon", 1e-5))
    axis = int(node.attrs.get("axis", -1))
    shape = [1] * data.ndim
    shape[axis] = -1
    inv = (1.0 / np.sqrt(var.astype(np.float32) + np.float32(eps))).astype(np.float32)
    out = (data.astype(np.float32) - mean.reshape(shape)) * (gamma * inv).reshape(shape) + beta.reshape(shape)
    return out.astype(data.dtype)


@infer_rule("nn.layer_norm")
def _ln_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    return ins[0]


@np_impl("nn.layer_norm")
def _ln_np(data, gamma, beta, *, node: Node):
    axis = int(node.attrs.get("axis", -1))
    eps = float(node.attrs.get("epsilon", 1e-5))
    x = data.astype(np.float32)
    mu = x.mean(axis=axis, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=axis, keepdims=True)
    shape = [1] * data.ndim
    shape[axis] = -1
    out = (x - mu) / np.sqrt(var + eps) * gamma.reshape(shape) + beta.reshape(shape)
    return out.astype(data.dtype)


# activations / softmax ------------------------------------------------------

def _same_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    return ins[0]


for _name in ("nn.relu", "nn.softmax", "nn.log_softmax", "nn.dropout", "sigmoid", "tanh",
              "erf", "exp", "log", "sqrt", "rsqrt", "negative", "abs", "round",
              "floor", "ceil", "sign", "copy", "nn.gelu", "nn.silu"):
    register_op(_name, infer=_same_rel)


@np_impl("nn.relu")
def _relu_np(x, *, node: Node):
    return np.maximum(x, np.zeros((), dtype=x.dtype))


@infer_rule("nn.leaky_relu")
def _lrelu_rel(node: Node, ins):
    return ins[0]


@np_impl("nn.leaky_relu")
def _lrelu_np(x, *, node: Node):
    alpha = np.float32(node.attrs.get("alpha", 0.01))
    return np.where(x >= 0, x, (x.astype(np.float32) * alpha).astype(x.dtype))


@infer_rule("nn.prelu")
def _prelu_rel(node: Node, ins):
    return ins[0]


@np_impl("nn.prelu")
def _prelu_np(x, alpha, *, node: Node):
    axis = int(node.attrs.get("axis", -1))
    shape = [1] * x.ndim
    shape[axis] = -1
    return np.where(x >= 0, x, x * alpha.reshape(shape)).astype(x.dtype)


@np_impl("nn.softmax")
def _softmax_np(x, *, node: Node):
    axis = int(node.attrs.get("axis", -1))
    x32 = x.astype(np.float32)
    m = x32.max(axis=axis, keepdims=True)
    e = np.exp(x32 - m)
    return (e / e.sum(axis=axis, keepdims=True)).astype(x.dtype)


@np_impl("nn.log_softmax")
def _log_softmax_np(x, *, node: Node):
    axis = int(node.attrs.get("axis", -1))
    x32 = x.astype(np.float32)
    m = x32.max(axis=axis, keepdims=True)
    s = np.log(np.exp(x32 - m).sum(axis=axis, keepdims=True))
    return (x32 - m - s).astype(x.dtype)


@np_impl("nn.dropout")
def _dropout_np(x, *, node: Node):
    return x  # inference mode: identity (reference lowers the same way)


@np_impl("sigmoid")
def _sigmoid_np(x, *, node: Node):
    x32 = x.astype(np.float32)
    return (1.0 / (1.0 + np.exp(-x32))).astype(x.dtype)


@np_impl("tanh")
def _tanh_np(x, *, node: Node):
    return np.tanh(x.astype(np.float32)).astype(x.dtype)


@np_impl("erf")
def _erf_np(x, *, node: Node):
    try:
        from scipy.special import erf as _serf  # type: ignore

        return _serf(x.astype(np.float32)).astype(x.dtype)
    except ImportError:
        out = np.vectorize(math.erf)(x.astype(np.float64))
        return out.astype(x.dtype)


@np_impl("nn.gelu")
def _gelu_np(x, *, node: Node):
    x32 = x.astype(np.float32)
    if node.attrs.get("approximate", "none") == "tanh":
        c = np.float32(math.sqrt(2.0 / math.pi))
        out = 0.5 * x32 * (1.0 + np.tanh(c * (x32 + 0.044715 * x32**3)))
    else:
        try:
            from scipy.special import erf as _erf  # type: ignore

            out = 0.5 * x32 * (1.0 + _erf(x32 / np.float32(math.sqrt(2.0))))
        except ImportError:
            out = 0.5 * x32 * (1.0 + np.vectorize(math.erf)(x32.astype(np.float64)).astype(np.float32))
    return out.astype(x.dtype)


@np_impl("nn.silu")
def _silu_np(x, *, node: Node):
    x32 = x.astype(np.float32)
    return (x32 / (1.0 + np.exp(-x32))).astype(x.dtype)


for _n, _f in {
    "exp": np.exp, "log": np.log, "sqrt": np.sqrt,
    "negative": np.negative, "abs": np.abs,
    "floor": np.floor, "ceil": np.ceil, "sign": np.sign,
}.items():
    def _mk(f):
        def impl(x, *, node: Node):
            if dt.is_int(str(x.dtype)) and f in (np.negative, np.abs, np.sign):
                return f(x)
            return f(x.astype(np.float32)).astype(x.dtype)
        return impl
    register_op(_n, np_impl=_mk(_f))


@np_impl("rsqrt")
def _rsqrt_np(x, *, node: Node):
    return (1.0 / np.sqrt(x.astype(np.float32))).astype(x.dtype)


@np_impl("round")
def _round_np(x, *, node: Node):
    # TVM `round` lowers to nearbyint (ties-to-even) == np.rint
    return np.rint(x.astype(np.float32)).astype(x.dtype)


@np_impl("copy")
def _copy_np(x, *, node: Node):
    return x


@infer_rule("clip")
def _clip_rel(node: Node, ins):
    return ins[0]


@np_impl("clip")
def _clip_np(x, *, node: Node):
    a_min, a_max = node.attrs["a_min"], node.attrs["a_max"]
    if dt.is_int(str(x.dtype)):
        return np.clip(x, int(a_min), int(a_max)).astype(x.dtype)
    return np.clip(x, np.float32(a_min), np.float32(a_max)).astype(x.dtype)


# elementwise binary ---------------------------------------------------------

def _broadcast_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (a, adt), (b, bdt) = ins[0], ins[1]
    return broadcast_shapes(a, b), dt.promote(adt, bdt)


def _cmp_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (a, _), (b, _) = ins[0], ins[1]
    return broadcast_shapes(a, b), "bool"


_BINOPS = {
    "add": np.add,
    "subtract": np.subtract,
    "multiply": np.multiply,
    "maximum": np.maximum,
    "minimum": np.minimum,
    "floor_divide": np.floor_divide,
    "bitwise_and": np.bitwise_and,
    "bitwise_or": np.bitwise_or,
    "bitwise_xor": np.bitwise_xor,
    "left_shift": np.left_shift,
    "right_shift": np.right_shift,
    "mod": np.mod,
}

for _n, _f in _BINOPS.items():
    def _mkb(f):
        def impl(a, b, *, node: Node):
            out_dt = np.dtype(dt.promote(str(a.dtype), str(b.dtype)))
            return f(a.astype(out_dt), b.astype(out_dt))
        return impl
    register_op(_n, infer=_broadcast_rel, np_impl=_mkb(_f))


@infer_rule("divide")
def _div_rel(node: Node, ins):
    return _broadcast_rel(node, ins)


@np_impl("divide")
def _div_np(a, b, *, node: Node):
    out_dt = np.dtype(dt.promote(str(a.dtype), str(b.dtype)))
    if dt.is_int(str(out_dt)):
        # TVM integer divide truncates toward zero (C semantics)
        q = a.astype(np.int64) // b.astype(np.int64)
        r = a.astype(np.int64) % b.astype(np.int64)
        q = np.where((r != 0) & ((a < 0) != (b < 0)), q + 1, q)
        return q.astype(out_dt)
    return (a.astype(out_dt) / b.astype(out_dt))


@infer_rule("power")
def _pow_rel(node: Node, ins):
    return _broadcast_rel(node, ins)


@np_impl("power")
def _pow_np(a, b, *, node: Node):
    out_dt = np.dtype(dt.promote(str(a.dtype), str(b.dtype)))
    return np.power(a.astype(out_dt), b.astype(out_dt))


for _n, _f in {
    "equal": np.equal, "not_equal": np.not_equal,
    "less": np.less, "less_equal": np.less_equal,
    "greater": np.greater, "greater_equal": np.greater_equal,
    "logical_and": np.logical_and, "logical_or": np.logical_or,
}.items():
    def _mkc(f):
        def impl(a, b, *, node: Node):
            return f(a, b)
        return impl
    register_op(_n, infer=_cmp_rel, np_impl=_mkc(_f))


@infer_rule("logical_not")
def _lnot_rel(node: Node, ins):
    (a, _) = ins[0]
    return a, "bool"


@np_impl("logical_not")
def _lnot_np(a, *, node: Node):
    return np.logical_not(a)


@infer_rule("where")
def _where_rel(node: Node, ins):
    (c, _), (a, adt), (b, bdt) = ins
    return broadcast_shapes(broadcast_shapes(c, a), b), dt.promote(adt, bdt)


@np_impl("where")
def _where_np(c, a, b, *, node: Node):
    return np.where(c, a, b)


# shape manipulation ---------------------------------------------------------

@infer_rule("reshape")
def _reshape_rel(node: Node, ins):
    (a, adt) = ins[0]
    newshape = list(node.attrs["newshape"])
    total = int(np.prod(a))
    if -1 in newshape:
        known = int(np.prod([s for s in newshape if s != -1]))
        newshape[newshape.index(-1)] = total // max(known, 1)
    assert int(np.prod(newshape)) == total, f"reshape {a} -> {newshape}"
    return tuple(int(s) for s in newshape), adt


@np_impl("reshape")
def _reshape_np(a, *, node: Node):
    newshape = tuple(int(s) for s in node.attrs["newshape"])
    return a.reshape(newshape)


@infer_rule("nn.batch_flatten")
def _bflat_rel(node: Node, ins):
    (a, adt) = ins[0]
    return (a[0], int(np.prod(a[1:]))), adt


@np_impl("nn.batch_flatten")
def _bflat_np(a, *, node: Node):
    return a.reshape(a.shape[0], -1)


@infer_rule("transpose")
def _transpose_rel(node: Node, ins):
    (a, adt) = ins[0]
    axes = node.attrs.get("axes")
    if axes is None:
        axes = tuple(reversed(range(len(a))))
    return tuple(a[i] for i in axes), adt


@np_impl("transpose")
def _transpose_np(a, *, node: Node):
    axes = node.attrs.get("axes")
    return np.transpose(a, axes)


@infer_rule("squeeze")
def _squeeze_rel(node: Node, ins):
    (a, adt) = ins[0]
    axes = node.attrs.get("axis")
    if axes is None:
        return tuple(s for s in a if s != 1), adt
    axes = [ax % len(a) for ax in (axes if isinstance(axes, (tuple, list)) else [axes])]
    return tuple(s for i, s in enumerate(a) if i not in axes), adt


@np_impl("squeeze")
def _squeeze_np(a, *, node: Node):
    axes = node.attrs.get("axis")
    if axes is not None and not isinstance(axes, (tuple, list)):
        axes = (axes,)
    return np.squeeze(a, axis=tuple(axes) if axes is not None else None)


@infer_rule("expand_dims")
def _expand_rel(node: Node, ins):
    (a, adt) = ins[0]
    axis = int(node.attrs["axis"])
    num = int(node.attrs.get("num_newaxis", 1))
    axis = axis % (len(a) + 1)
    return tuple(a[:axis]) + (1,) * num + tuple(a[axis:]), adt


@np_impl("expand_dims")
def _expand_np(a, *, node: Node):
    axis = int(node.attrs["axis"]) % (a.ndim + 1)
    num = int(node.attrs.get("num_newaxis", 1))
    shape = a.shape[:axis] + (1,) * num + a.shape[axis:]
    return a.reshape(shape)


@infer_rule("concatenate")
def _concat_rel(node: Node, ins):
    axis = int(node.attrs.get("axis", 0))
    shapes = [s for s, _ in ins]
    axis = axis % len(shapes[0])
    out = list(shapes[0])
    out[axis] = sum(s[axis] for s in shapes)
    dtype = ins[0][1]
    for _, d in ins[1:]:
        dtype = dt.promote(dtype, d)
    return tuple(out), dtype


@np_impl("concatenate")
def _concat_np(*args, node: Node):
    return np.concatenate(args, axis=int(node.attrs.get("axis", 0)))


@infer_rule("split")
def _split_rel(node: Node, ins):
    (a, adt) = ins[0]
    axis = int(node.attrs.get("axis", 0)) % len(a)
    iops = node.attrs["indices_or_sections"]
    if isinstance(iops, int):
        assert a[axis] % iops == 0
        sec = a[axis] // iops
        sizes = [sec] * iops
    else:
        pts = [0] + list(iops) + [a[axis]]
        sizes = [pts[i + 1] - pts[i] for i in range(len(pts) - 1)]
    out = []
    for s in sizes:
        sh = list(a)
        sh[axis] = s
        out.append((tuple(sh), adt))
    return out


@np_impl("split")
def _split_np(a, *, node: Node):
    axis = int(node.attrs.get("axis", 0))
    iops = node.attrs["indices_or_sections"]
    if not isinstance(iops, int):
        iops = list(iops)
    return list(np.split(a, iops, axis=axis))


@infer_rule("strided_slice")
def _sslice_rel(node: Node, ins):
    (a, adt) = ins[0]
    begin = list(node.attrs["begin"])
    end = list(node.attrs["end"])
    strides = list(node.attrs.get("strides") or [1] * len(begin))
    axes = node.attrs.get("axes")
    out = list(a)
    idx_axes = axes if axes is not None else range(len(begin))
    for k, ax in enumerate(idx_axes):
        b, e, s = begin[k], end[k], strides[k]
        dim = a[ax]
        out[ax] = len(range(*slice(b, e, s).indices(dim)))
    return tuple(out), adt


@np_impl("strided_slice")
def _sslice_np(a, *, node: Node):
    begin = list(node.attrs["begin"])
    end = list(node.attrs["end"])
    strides = list(node.attrs.get("strides") or [1] * len(begin))
    axes = node.attrs.get("axes")
    idx = [slice(None)] * a.ndim
    idx_axes = axes if axes is not None else range(len(begin))
    for k, ax in enumerate(idx_axes):
        e = end[k]
        idx[ax] = slice(begin[k], None if e is None else e, strides[k])
    return a[tuple(idx)]


@infer_rule("take")
def _take_rel(node: Node, ins):
    (a, adt), (i, _) = ins[0], ins[1]
    axis = node.attrs.get("axis")
    if axis is None:
        return tuple(i), adt
    axis = int(axis) % len(a)
    return tuple(a[:axis]) + tuple(i) + tuple(a[axis + 1 :]), adt


@np_impl("take")
def _take_np(a, indices, *, node: Node):
    axis = node.attrs.get("axis")
    mode = node.attrs.get("mode", "clip")
    if mode == "clip":
        hi = (a.size if axis is None else a.shape[int(axis)]) - 1
        indices = np.clip(indices, 0, hi)
    elif mode == "wrap":
        n = a.size if axis is None else a.shape[int(axis)]
        indices = indices % n
    return np.take(a, indices, axis=None if axis is None else int(axis))


@infer_rule("gather")
def _gather_rel(node: Node, ins):
    (_, adt), (i, _) = ins[0], ins[1]
    return tuple(i), adt


@np_impl("gather")
def _gather_np(a, indices, *, node: Node):
    axis = int(node.attrs.get("axis", 0))
    return np.take_along_axis(a, indices.astype(np.int64), axis=axis)


@infer_rule("broadcast_to")
def _bto_rel(node: Node, ins):
    (a, adt) = ins[0]
    return tuple(int(s) for s in node.attrs["shape"]), adt


@np_impl("broadcast_to")
def _bto_np(a, *, node: Node):
    return np.broadcast_to(a, tuple(int(s) for s in node.attrs["shape"])).copy()


@infer_rule("tile")
def _tile_rel(node: Node, ins):
    (a, adt) = ins[0]
    reps = tuple(int(r) for r in node.attrs["reps"])
    return tuple(int(s) for s in np.tile(np.empty(a, dtype=np.bool_), reps).shape), adt


@np_impl("tile")
def _tile_np(a, *, node: Node):
    return np.tile(a, tuple(int(r) for r in node.attrs["reps"]))


@infer_rule("nn.pad")
def _pad_rel(node: Node, ins):
    (a, adt) = ins[0]
    pw = node.attrs["pad_width"]
    return tuple(int(s + b + e) for s, (b, e) in zip(a, pw)), adt


@np_impl("nn.pad")
def _pad_np(a, *, node: Node):
    pw = [(int(b), int(e)) for b, e in node.attrs["pad_width"]]
    mode = node.attrs.get("pad_mode", "constant")
    if mode == "constant":
        val = node.attrs.get("pad_value", 0)
        if dt.is_int(str(a.dtype)):
            val = int(val)
        return np.pad(a, pw, constant_values=val)
    return np.pad(a, pw, mode={"edge": "edge", "reflect": "reflect"}[mode])


@infer_rule("cast")
def _cast_rel(node: Node, ins):
    (a, _) = ins[0]
    return tuple(a), node.attrs["dtype"]


@np_impl("cast")
def _cast_np(a, *, node: Node):
    # C-style truncation cast for float->int (TVM semantics)
    target = node.attrs["dtype"]
    if dt.is_float(str(a.dtype)) and dt.is_int(target):
        return np.trunc(a).astype(target)
    return a.astype(target)


# reductions -----------------------------------------------------------------

def _reduce_rel(node: Node, ins):
    (a, adt) = ins[0]
    axes = node.attrs.get("axis")
    keepdims = node.attrs.get("keepdims", False)
    if axes is None:
        axes = tuple(range(len(a)))
    elif not isinstance(axes, (tuple, list)):
        axes = (axes,)
    axes = tuple(ax % len(a) for ax in axes)
    if keepdims:
        shape = tuple(1 if i in axes else s for i, s in enumerate(a))
    else:
        shape = tuple(s for i, s in enumerate(a) if i not in axes)
    return shape, adt


def _norm_axes(node: Node, ndim: int):
    axes = node.attrs.get("axis")
    if axes is None:
        return None
    if not isinstance(axes, (tuple, list)):
        axes = (axes,)
    return tuple(ax % ndim for ax in axes)


for _n, _f in {"sum": np.sum, "max": np.max, "min": np.min, "prod": np.prod,
               "mean": np.mean, "all": np.all, "any": np.any}.items():
    def _mkr(f, name):
        def impl(a, *, node: Node):
            axes = _norm_axes(node, a.ndim)
            keepdims = bool(node.attrs.get("keepdims", False))
            if name == "mean" and not dt.is_float(str(a.dtype)):
                out = f(a.astype(np.float64), axis=axes, keepdims=keepdims)
                return out.astype(a.dtype)
            if name in ("sum", "prod") and dt.is_int(str(a.dtype)):
                return f(a.astype(np.int64), axis=axes, keepdims=keepdims).astype(
                    "int32" if str(a.dtype) in ("int8", "uint8", "int16", "int32") else a.dtype
                )
            out = f(a.astype(np.float32) if name == "mean" else a, axis=axes, keepdims=keepdims)
            return np.asarray(out, dtype=a.dtype if name not in ("all", "any") else "bool")
        return impl
    register_op(_n, infer=_reduce_rel if _n not in ("all", "any") else None, np_impl=_mkr(_f, _n))

register_op("all", infer=lambda n, i: (_reduce_rel(n, i)[0], "bool"))
register_op("any", infer=lambda n, i: (_reduce_rel(n, i)[0], "bool"))


@infer_rule("sum")
def _sum_rel(node: Node, ins):
    shape, adt = _reduce_rel(node, ins)
    if str(adt) in ("int8", "uint8", "int16", "int32"):
        return shape, "int32"
    return shape, adt


@infer_rule("argmax")
def _argmax_rel(node: Node, ins):
    shape, _ = _reduce_rel(node, ins)
    return shape, "int32"


@np_impl("argmax")
def _argmax_np(a, *, node: Node):
    axes = _norm_axes(node, a.ndim)
    ax = axes[0] if axes else None
    out = np.argmax(a, axis=ax)
    if node.attrs.get("keepdims", False) and ax is not None:
        out = np.expand_dims(out, ax)
    return out.astype(np.int32)


@infer_rule("argmin")
def _argmin_rel(node: Node, ins):
    shape, _ = _reduce_rel(node, ins)
    return shape, "int32"


@np_impl("argmin")
def _argmin_np(a, *, node: Node):
    axes = _norm_axes(node, a.ndim)
    ax = axes[0] if axes else None
    out = np.argmin(a, axis=ax)
    if node.attrs.get("keepdims", False) and ax is not None:
        out = np.expand_dims(out, ax)
    return out.astype(np.int32)


@infer_rule("variance")
def _var_rel(node: Node, ins):
    return _reduce_rel(node, ins)


@np_impl("variance")
def _var_np(a, *, node: Node):
    axes = _norm_axes(node, a.ndim)
    return np.var(a.astype(np.float32), axis=axes,
                  keepdims=bool(node.attrs.get("keepdims", False))).astype(a.dtype)


# misc -----------------------------------------------------------------------

@infer_rule("one_hot")
def _onehot_rel(node: Node, ins):
    (i, _) = ins[0]
    depth = int(node.attrs["depth"])
    axis = int(node.attrs.get("axis", -1))
    shape = list(i)
    if axis == -1:
        shape = shape + [depth]
    else:
        shape.insert(axis, depth)
    return tuple(shape), node.attrs.get("dtype", "float32")


@np_impl("one_hot")
def _onehot_np(indices, *, node: Node):
    depth = int(node.attrs["depth"])
    on = node.attrs.get("on_value", 1)
    off = node.attrs.get("off_value", 0)
    dtype = node.attrs.get("dtype", "float32")
    eye = np.full((depth,), off, dtype=dtype)
    out = np.full(indices.shape + (depth,), off, dtype=dtype)
    idx = np.clip(indices, 0, depth - 1)
    np.put_along_axis(out, idx[..., None].astype(np.int64), np.asarray(on, dtype=dtype), axis=-1)
    mask = (indices >= 0) & (indices < depth)
    out = np.where(mask[..., None], out, np.asarray(off, dtype=dtype))
    axis = int(node.attrs.get("axis", -1))
    if axis != -1:
        out = np.moveaxis(out, -1, axis)
    return out


@infer_rule("image.resize2d")
def _resize2d_rel(node: Node, ins):
    (a, adt) = ins[0]
    n, h, w, c = a
    oh, ow = _pair(node.attrs["size"])
    return (n, oh, ow, c), adt


def _resize2d_src_coords(in_size: int, out_size: int, ctm: str) -> np.ndarray:
    """Float source coordinates for each output index, per the ONNX/TVM
    coordinate_transformation_mode semantics
    (reference: python/tvm/topi/image/resize.py get_inx)."""
    x = np.arange(out_size, dtype=np.float64)
    if ctm == "asymmetric":
        return x * in_size / out_size
    if ctm == "half_pixel":
        return (x + 0.5) * in_size / out_size - 0.5
    if ctm == "align_corners":
        return x * (in_size - 1) / max(out_size - 1, 1)
    raise NotImplementedError(
        f"resize2d coordinate_transformation_mode {ctm!r}")


def _resize2d_nn_index(in_size: int, out_size: int, ctm: str,
                       rm: str) -> np.ndarray:
    xin = _resize2d_src_coords(in_size, out_size, ctm)
    if rm == "floor":
        idx = np.floor(xin)
    elif rm == "ceil":
        idx = np.ceil(xin)
    elif rm == "round_prefer_floor":
        idx = np.ceil(xin - 0.5)
    elif rm == "round_prefer_ceil":
        idx = np.floor(xin + 0.5)
    else:
        raise NotImplementedError(f"resize2d rounding_method {rm!r}")
    return np.clip(idx, 0, in_size - 1).astype(np.int64)


def _resize2d_linear_taps(in_size: int, out_size: int, ctm: str):
    """(lo_index, hi_index, hi_weight) static arrays for 1-D linear resize."""
    xin = np.clip(_resize2d_src_coords(in_size, out_size, ctm), 0, in_size - 1)
    lo = np.floor(xin).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    return lo, hi, (xin - lo).astype(np.float32)


def _resize2d_common(a, node):
    """Shared np/jax resize2d: all indices/weights are STATIC numpy arrays
    (shapes are static), so both backends perform the identical gathers."""
    oh, ow = _pair(node.attrs["size"])
    method = node.attrs.get("method", "nearest_neighbor")
    ctm = node.attrs.get("coordinate_transformation_mode", "asymmetric")
    n, h, w, c = a.shape
    if method in ("nearest_neighbor", "nearest"):
        rm = node.attrs.get("rounding_method", "floor")
        ys = _resize2d_nn_index(h, oh, ctm, rm)
        xs = _resize2d_nn_index(w, ow, ctm, rm)
        return a[:, ys][:, :, xs]
    if method in ("linear", "bilinear"):
        if not np.issubdtype(np.dtype(str(a.dtype)), np.floating):
            raise NotImplementedError(
                "resize2d linear requires float input (dequantize first); "
                f"got {a.dtype}")
        ylo, yhi, wy = _resize2d_linear_taps(h, oh, ctm)
        xlo, xhi, wx = _resize2d_linear_taps(w, ow, ctm)
        wy = wy.reshape(1, oh, 1, 1).astype(str(a.dtype))
        wx = wx.reshape(1, 1, ow, 1).astype(str(a.dtype))
        top = a[:, ylo]
        bot = a[:, yhi]
        row = top + (bot - top) * wy
        left = row[:, :, xlo]
        right = row[:, :, xhi]
        return left + (right - left) * wx
    raise NotImplementedError(f"resize2d method {method}")


@np_impl("image.resize2d")
def _resize2d_np(a, *, node: Node):
    return _resize2d_common(a, node)


@infer_rule("nn.depth_to_space")
def _d2s_rel(node: Node, ins):
    (a, adt) = ins[0]
    n, h, w, c = a
    b = int(node.attrs["block_size"])
    return (n, h * b, w * b, c // (b * b)), adt


@np_impl("nn.depth_to_space")
def _d2s_np(a, *, node: Node):
    n, h, w, c = a.shape
    b = int(node.attrs["block_size"])
    mode = node.attrs.get("mode", "DCR")
    if mode == "DCR":
        x = a.reshape(n, h, w, b, b, c // (b * b))
    else:
        x = a.reshape(n, h, w, c // (b * b), b, b).transpose(0, 1, 2, 4, 5, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * b, w * b, c // (b * b))


@infer_rule("nn.space_to_depth")
def _s2d_rel(node: Node, ins):
    (a, adt) = ins[0]
    n, h, w, c = a
    b = int(node.attrs["block_size"])
    return (n, h // b, w // b, c * b * b), adt


@np_impl("nn.space_to_depth")
def _s2d_np(a, *, node: Node):
    n, h, w, c = a.shape
    b = int(node.attrs["block_size"])
    x = a.reshape(n, h // b, b, w // b, b, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // b, w // b, b * b * c)


@infer_rule("fixed_point_multiply")
def _fpm_rel(node: Node, ins):
    (a, _) = ins[0]
    return tuple(a), "int32"


@np_impl("fixed_point_multiply")
def _fpm_np(a, *, node: Node):
    from .fixed_point import q_multiply_shift_np

    return q_multiply_shift_np(
        a.astype(np.int32),
        int(node.attrs["multiplier"]),
        int(node.attrs["shift"]),
        node.attrs.get("rounding", "UPWARD"),
    )


@infer_rule("fixed_point_multiply_per_axis")
def _fpm_pa_rel(node: Node, ins):
    (a, _) = ins[0]
    return tuple(a), "int32"


@np_impl("fixed_point_multiply_per_axis")
def _fpm_pa_np(a, *, node: Node):
    from .fixed_point import q_multiply_shift_per_axis_np

    return q_multiply_shift_per_axis_np(
        a.astype(np.int32),
        np.asarray(node.attrs["multipliers"], dtype=np.int64),
        np.asarray(node.attrs["shifts"], dtype=np.int64),
        int(node.attrs["axis"]),
        node.attrs.get("rounding", "UPWARD"),
    )
