"""QNN dialect — the integer core of the framework.

Reimplements, with bit-identical integer semantics, the reference's QNN ops
(`src/relay/qnn/op/*.cc`, SURVEY.md §8.2).  Zero points and scales are carried
as node *attrs* (canonicalized scalars / per-channel lists), not as extra
const inputs like Relay does — the graph stays lean and the trace record
carries them as op params.

Semantics sources (file:line in /root/reference):
  * qnn.quantize   — `src/relay/qnn/op/quantize.cc:113-149` QuantizeLower:
                     cast(clip(round(x/scale) + zp, qmin, qmax), out_dtype),
                     round = nearbyint (ties-to-even).
  * qnn.dequantize — `src/relay/qnn/op/dequantize.cc` DequantizeLower:
                     (cast(x, i32) - zp) * scale, in float32.
  * qnn.requantize — `src/relay/qnn/op/requantize.cc:195` RequantizeLowerInt
                     (see ops/fixed_point.py).
  * qnn.conv2d     — `src/relay/qnn/op/convolution.cc`: conv((x - izp),
                     (w - kzp)) with int32 accumulation.
  * qnn.dense      — `src/relay/qnn/op/dense.cc`: same shape of computation.
  * qnn.add        — `src/relay/qnn/op/add.cc:40-97`: requantize both sides to
                     output qparams (int32), add, subtract one zp, clip.
  * qnn.mul        — `src/relay/qnn/op/mul.cc:43-140`: (lhs-zp)*(rhs-zp) int32,
                     requantize from scale la*ra (zp 0) to output qparams.
  * qnn.concatenate— `src/relay/qnn/op/concatenate.cc`: requantize each input
                     to output qparams, concatenate.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..ir.graph import Node
from ..ir.registry import TensorType, infer_rule, np_impl, flops_rule, register_op
from ..utils import dtypes as dt
from . import nn as _nn
from .fixed_point import requantize_np


# -- quantize / dequantize / requantize -------------------------------------

@infer_rule("qnn.quantize")
def _quantize_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (a, _) = ins[0]
    return tuple(a), node.attrs.get("out_dtype", "int8")


@np_impl("qnn.quantize")
def _quantize_np(x: np.ndarray, *, node: Node) -> np.ndarray:
    out_dtype = node.attrs.get("out_dtype", "int8")
    scale = np.asarray(node.attrs["scale"], dtype=np.float32)
    zp = np.asarray(node.attrs.get("zero_point", 0), dtype=np.int32)
    axis = int(node.attrs.get("axis", -1))
    if scale.ndim > 0:
        shape = [1] * x.ndim
        shape[axis] = -1
        scale = scale.reshape(shape)
        zp = np.asarray(zp).reshape(shape) if np.ndim(zp) > 0 else zp
    scaled = np.rint(x.astype(np.float32) / scale)  # nearbyint: ties-to-even
    shifted = scaled + zp.astype(np.float32)
    lo, hi = dt.qmin(out_dtype), dt.qmax(out_dtype)
    return np.clip(shifted, lo, hi).astype(out_dtype)


@infer_rule("qnn.dequantize")
def _dequantize_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (a, _) = ins[0]
    return tuple(a), "float32"


@np_impl("qnn.dequantize")
def _dequantize_np(x: np.ndarray, *, node: Node) -> np.ndarray:
    scale = np.asarray(node.attrs["scale"], dtype=np.float32)
    zp = np.asarray(node.attrs.get("zero_point", 0), dtype=np.int32)
    axis = int(node.attrs.get("axis", -1))
    if scale.ndim > 0:
        shape = [1] * x.ndim
        shape[axis] = -1
        scale = scale.reshape(shape)
        zp = np.asarray(zp).reshape(shape) if np.ndim(zp) > 0 else zp
    return ((x.astype(np.int32) - zp).astype(np.float32) * scale).astype(np.float32)


@infer_rule("qnn.requantize")
def _requantize_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (a, _) = ins[0]
    return tuple(a), node.attrs.get("out_dtype", "int8")


@np_impl("qnn.requantize")
def _requantize_np(x: np.ndarray, *, node: Node) -> np.ndarray:
    return requantize_np(
        x,
        node.attrs["input_scale"],
        int(node.attrs.get("input_zero_point", 0)),
        float(node.attrs["output_scale"]),
        int(node.attrs.get("output_zero_point", 0)),
        axis=int(node.attrs.get("axis", -1)),
        rounding=node.attrs.get("rounding", "UPWARD"),
        out_dtype=node.attrs.get("out_dtype", "int8"),
    )


# -- quantized conv / dense / matmul ----------------------------------------

@infer_rule("qnn.conv2d")
def _qconv_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    shape, _ = _nn._conv2d_rel(node, ins)
    return shape, node.attrs.get("out_dtype", "int32")


@np_impl("qnn.conv2d")
def _qconv_np(data: np.ndarray, weight: np.ndarray, *, node: Node) -> np.ndarray:
    izp = int(node.attrs.get("input_zero_point", 0))
    kzp = node.attrs.get("kernel_zero_point", 0)
    d = data.astype(np.int64) - izp
    w = weight.astype(np.int64)
    if np.ndim(kzp) > 0:
        w = w - np.asarray(kzp, dtype=np.int64).reshape(1, 1, 1, -1)
    elif int(kzp) != 0:
        w = w - int(kzp)
    shadow = node.with_(attrs={**dict(node.attrs), "out_dtype": None})
    out = _nn._conv2d_np(d, w, node=shadow)
    return out.astype(node.attrs.get("out_dtype", "int32"))


register_op("qnn.conv2d", flops=_nn._conv2d_flops)


@infer_rule("qnn.conv2d_transpose")
def _qconvt_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    shape, _ = _nn._conv2d_t_rel(node, ins)
    return shape, node.attrs.get("out_dtype", "int32")


@np_impl("qnn.conv2d_transpose")
def _qconvt_np(data: np.ndarray, weight: np.ndarray, *, node: Node) -> np.ndarray:
    izp = int(node.attrs.get("input_zero_point", 0))
    kzp = int(node.attrs.get("kernel_zero_point", 0))
    d = data.astype(np.int64) - izp
    w = weight.astype(np.int64) - kzp
    shadow = node.with_(attrs={**dict(node.attrs), "out_dtype": None})
    out = _nn._conv2d_t_np(d, w, node=shadow)
    return out.astype(node.attrs.get("out_dtype", "int32"))


@infer_rule("qnn.dense")
def _qdense_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    shape, _ = _nn._dense_rel(node, ins)
    return shape, node.attrs.get("out_dtype", "int32")


@np_impl("qnn.dense")
def _qdense_np(data: np.ndarray, weight: np.ndarray, *, node: Node) -> np.ndarray:
    izp = int(node.attrs.get("input_zero_point", 0))
    kzp = node.attrs.get("kernel_zero_point", 0)
    d = data.astype(np.int64) - izp
    w = weight.astype(np.int64)
    if np.ndim(kzp) > 0:
        w = w - np.asarray(kzp, dtype=np.int64).reshape(1, -1)
    elif int(kzp) != 0:
        w = w - int(kzp)
    out = d @ w
    return out.astype(node.attrs.get("out_dtype", "int32"))


register_op("qnn.dense", flops=_nn._dense_flops)


@infer_rule("qnn.batch_matmul")
def _qbmm_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    shape, _ = _nn._bmm_rel(node, ins)
    return shape, node.attrs.get("out_dtype", "int32")


@np_impl("qnn.batch_matmul")
def _qbmm_np(a: np.ndarray, b: np.ndarray, *, node: Node) -> np.ndarray:
    azp = int(node.attrs.get("lhs_zero_point", 0))
    bzp = int(node.attrs.get("rhs_zero_point", 0))
    x = a.astype(np.int64) - azp
    y = b.astype(np.int64) - bzp
    if node.attrs.get("transpose_a", False):
        x = np.swapaxes(x, -1, -2)
    if node.attrs.get("transpose_b", False):
        y = np.swapaxes(y, -1, -2)
    out = x @ y
    return out.astype(node.attrs.get("out_dtype", "int32"))


register_op("qnn.batch_matmul", flops=_nn._bmm_flops)


# -- quantized elementwise ---------------------------------------------------

def _qbinary_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (a, adt), (b, _) = ins[0], ins[1]
    return _nn.broadcast_shapes(a, b), node.attrs.get("out_dtype", adt)


def _requant_to_out(x: np.ndarray, scale, zp, node: Node) -> np.ndarray:
    """RequantizeOrUpcast (`src/relay/qnn/op/op_common.h`): skip the multiply
    when input and output qparams match; always lands in int32."""
    oscale = float(node.attrs["output_scale"])
    ozp = int(node.attrs.get("output_zero_point", 0))
    scale_arr = np.asarray(scale, dtype=np.float64)
    if scale_arr.ndim == 0 and float(scale_arr) == oscale and int(zp) == ozp:
        return x.astype(np.int32)
    return requantize_np(
        x, scale, int(zp), oscale, ozp,
        axis=int(node.attrs.get("axis", -1)),
        rounding=node.attrs.get("rounding", "UPWARD"),
        out_dtype="int32",
    )


def _qadd_like(npop):
    def impl(lhs: np.ndarray, rhs: np.ndarray, *, node: Node) -> np.ndarray:
        out_dtype = node.attrs.get("out_dtype", "int8")
        ozp = int(node.attrs.get("output_zero_point", 0))
        ql = _requant_to_out(lhs, node.attrs["lhs_scale"], node.attrs.get("lhs_zero_point", 0), node)
        qr = _requant_to_out(rhs, node.attrs["rhs_scale"], node.attrs.get("rhs_zero_point", 0), node)
        out = npop(ql.astype(np.int64), qr.astype(np.int64)).astype(np.int32)
        if npop is np.add:
            out = out - np.int32(ozp)
        else:  # subtract: zp_c - (zp_c) cancels once the other way
            out = out + np.int32(ozp)
        lo, hi = dt.qmin(out_dtype), dt.qmax(out_dtype)
        return np.clip(out, lo, hi).astype(out_dtype)

    return impl


register_op("qnn.add", infer=_qbinary_rel, np_impl=_qadd_like(np.add))
register_op("qnn.subtract", infer=_qbinary_rel, np_impl=_qadd_like(np.subtract))


@infer_rule("qnn.mul")
def _qmul_rel(node: Node, ins):
    return _qbinary_rel(node, ins)


@np_impl("qnn.mul")
def _qmul_np(lhs: np.ndarray, rhs: np.ndarray, *, node: Node) -> np.ndarray:
    out_dtype = node.attrs.get("out_dtype", "int8")
    lzp = int(node.attrs.get("lhs_zero_point", 0))
    rzp = int(node.attrs.get("rhs_zero_point", 0))
    l = lhs.astype(np.int32) - np.int32(lzp)
    r = rhs.astype(np.int32) - np.int32(rzp)
    prod = (l.astype(np.int64) * r.astype(np.int64)).astype(np.int32)
    new_scale = float(np.asarray(node.attrs["lhs_scale"]).item()) * float(
        np.asarray(node.attrs["rhs_scale"]).item()
    )
    return requantize_np(
        prod, new_scale, 0,
        float(node.attrs["output_scale"]),
        int(node.attrs.get("output_zero_point", 0)),
        rounding=node.attrs.get("rounding", "UPWARD"),
        out_dtype=out_dtype,
    )


@infer_rule("qnn.concatenate")
def _qconcat_rel(node: Node, ins):
    return _nn._concat_rel(node, ins)


@np_impl("qnn.concatenate")
def _qconcat_np(*args: np.ndarray, node: Node) -> np.ndarray:
    # `src/relay/qnn/op/concatenate.cc`: requantize every input to the output
    # qparams, then concatenate.
    scales = node.attrs["input_scales"]
    zps = node.attrs["input_zero_points"]
    oscale = float(node.attrs["output_scale"])
    ozp = int(node.attrs.get("output_zero_point", 0))
    out_dtype = node.attrs.get("out_dtype", str(args[0].dtype))
    rounding = node.attrs.get("rounding", "UPWARD")
    parts = []
    for x, s, z in zip(args, scales, zps):
        if float(s) == oscale and int(z) == ozp:
            parts.append(x.astype(out_dtype))
        else:
            parts.append(
                requantize_np(x, float(s), int(z), oscale, ozp,
                              rounding=rounding, out_dtype=out_dtype)
            )
    return np.concatenate(parts, axis=int(node.attrs.get("axis", 0)))


@infer_rule("qnn.avg_pool2d")
def _qavgpool_rel(node: Node, ins):
    return _nn._pool_rel(node, ins)


@np_impl("qnn.avg_pool2d")
def _qavgpool_np(x: np.ndarray, *, node: Node) -> np.ndarray:
    # `src/relay/qnn/op/avg_pool2d.cc`: cast i32, subtract izp, pool (integer
    # average, round-half-away), requantize to output qparams, clip/cast.
    out_dtype = node.attrs.get("out_dtype", str(x.dtype))
    izp = int(node.attrs.get("input_zero_point", 0))
    v = x.astype(np.int32) - np.int32(izp)
    shadow = node.with_(attrs=dict(node.attrs))
    pooled = _nn._avg_pool2d_np(v, node=shadow)
    iscale = float(node.attrs["input_scale"])
    oscale = float(node.attrs["output_scale"])
    ozp = int(node.attrs.get("output_zero_point", 0))
    return requantize_np(
        pooled, iscale, 0, oscale, ozp,
        rounding=node.attrs.get("rounding", "UPWARD"), out_dtype=out_dtype
    )


@infer_rule("qnn.leaky_relu")
def _qlrelu_rel(node: Node, ins):
    (a, adt) = ins[0]
    return tuple(a), node.attrs.get("out_dtype", adt)


@np_impl("qnn.leaky_relu")
def _qlrelu_np(x: np.ndarray, *, node: Node) -> np.ndarray:
    # `src/relay/qnn/op/leaky_relu.cc`: positive branch requantized identity,
    # negative branch alpha * (Q - izp) via fixed-point multiply, + ozp.
    from .fixed_point import fixed_point_multiplier_shift, q_multiply_shift_np

    alpha = float(node.attrs.get("alpha", 0.01))
    iscale = float(node.attrs["input_scale"])
    izp = int(node.attrs.get("input_zero_point", 0))
    oscale = float(node.attrs["output_scale"])
    ozp = int(node.attrs.get("output_zero_point", 0))
    out_dtype = node.attrs.get("out_dtype", str(x.dtype))
    rounding = node.attrs.get("rounding", "UPWARD")
    pos = requantize_np(x, iscale, izp, oscale, ozp, rounding=rounding, out_dtype="int32")
    m, s = fixed_point_multiplier_shift(alpha * iscale / oscale)
    neg = q_multiply_shift_np((x.astype(np.int32) - izp), m, s, rounding) + np.int32(ozp)
    out = np.where(x.astype(np.int32) >= izp, pos, neg)
    lo, hi = dt.qmin(out_dtype), dt.qmax(out_dtype)
    return np.clip(out, lo, hi).astype(out_dtype)


# -- integer softmax & LUT ops ----------------------------------------------
# The reference has NO integer softmax (SURVEY.md §5.7: BERT's deterministic
# "softmax-free path" is a new design obligation).  We pin our own exact
# integer semantics here; both backends and the trace verifier share them.

LUT_EXP_BITS = 15          # exp table is Q15
LUT_SIZE = 256
SOFTMAX_OUT_SCALE = 1.0 / 256.0
SOFTMAX_OUT_ZP = -128


def softmax_exp_factors(input_scale: float) -> tuple[np.ndarray, np.ndarray]:
    """Factorized Q15 exp: table[k] == (hi[k >> 4] * lo[k & 15] + 2^14) >> 15.

    hi[j] ~ round(2^15 exp(-16 j s)), lo[i] ~ round(2^15 exp(-i s)).  hi is
    additionally CLAMPED so hi[j+1] <= (hi[j] * lo[15] + 2^14) >> 15, which
    makes the composed table monotone non-increasing BY CONSTRUCTION (raw
    rounding can violate it by 1 ulp deep in the tail).  Two 16-entry
    lookups + one Q15 multiply replace a 256-entry lookup — on TPU that is
    ~6x fewer packed-select ops (XLA lowers big-table gathers to scalar
    loads; see jax_ops._lut_select)."""
    s = float(input_scale)
    j = np.arange(16, dtype=np.float64)
    lo = np.rint((1 << LUT_EXP_BITS) * np.exp(-j * s)).astype(np.int64)
    hi = np.rint((1 << LUT_EXP_BITS) * np.exp(-16.0 * j * s)).astype(np.int64)
    r = 1 << (LUT_EXP_BITS - 1)
    for k in range(15):
        cap = (hi[k] * lo[15] + r) >> LUT_EXP_BITS
        if hi[k + 1] > cap:
            hi[k + 1] = cap
    return hi.astype(np.int32), lo.astype(np.int32)


def softmax_exp_table(input_scale: float) -> np.ndarray:
    """table[k] = (hi[k >> 4] * lo[k & 15] + 2^14) >> 15 (within 1 ulp of
    round(2^15 exp(-k s)), monotone non-increasing — softmax_exp_factors);
    the saturation bucket table[255] is pinned to 0 so scores >= 255
    quantization steps below the row max contribute nothing (otherwise the
    clip at index 255 would give every far-away score a probability floor
    of exp(-255*s), badly distorting concentrated distributions at small
    scales)."""
    hi, lo = softmax_exp_factors(input_scale)
    k = np.arange(LUT_SIZE)
    t = ((hi[k >> 4].astype(np.int64) * lo[k & 15]
          + (1 << (LUT_EXP_BITS - 1))) >> LUT_EXP_BITS).astype(np.int32)
    t[LUT_SIZE - 1] = 0
    return t


@infer_rule("qnn.softmax")
def _qsoftmax_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (a, _) = ins[0]
    return tuple(a), node.attrs.get("out_dtype", "int8")


@np_impl("qnn.softmax")
def _qsoftmax_np(x: np.ndarray, *, node: Node) -> np.ndarray:
    """Exact integer softmax:
      d    = clip(max(x) - x, 0, 255)
      p    = table[d]                      (Q15 exp)
      sum  = sum(p)
      q    = (p * 256 + sum // 2) // sum   (non-negative integer division)
      out  = clip(q - 128, -128, 127)      (scale 1/256, zp -128)
    """
    axis = int(node.attrs.get("axis", -1))
    table = softmax_exp_table(float(node.attrs["input_scale"]))
    v = x.astype(np.int64)
    m = v.max(axis=axis, keepdims=True)
    d = np.clip(m - v, 0, LUT_SIZE - 1)
    p = table[d].astype(np.int64)
    ssum = p.sum(axis=axis, keepdims=True)
    q = (p * 256 + ssum // 2) // ssum
    out = np.clip(q + SOFTMAX_OUT_ZP, -128, 127)
    return out.astype(node.attrs.get("out_dtype", "int8"))


@infer_rule("qnn.lut")
def _qlut_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (a, _) = ins[0]
    return tuple(a), node.attrs.get("out_dtype", "int8")


@np_impl("qnn.lut")
def _qlut_np(x: np.ndarray, *, node: Node) -> np.ndarray:
    """Generic int8 -> int8 elementwise op as a 256-entry table lookup
    (the TFLite-style realization of any quantized unary nonlinearity;
    replaces the reference's dequant->float->requant canonicalization of
    unary elementwise qnn ops, `src/relay/qnn/op/unary_elementwise_op.cc`)."""
    table = np.asarray(node.attrs["table"], dtype=np.int8)
    assert table.shape == (LUT_SIZE,)
    idx = x.astype(np.int32) + 128  # int8 -> [0, 255]
    return table[idx]


def build_lut(float_fn, input_scale: float, input_zp: int,
              output_scale: float, output_zp: int) -> np.ndarray:
    """table[q+128] = quantize(f(dequantize(q))) for q in [-128, 127]."""
    q = np.arange(-128, 128, dtype=np.int32)
    x = (q - input_zp).astype(np.float64) * input_scale
    y = float_fn(x.astype(np.float32)).astype(np.float64)
    out = np.rint(y / output_scale) + output_zp
    return np.clip(out, -128, 127).astype(np.int8)


# -- fused integer attention -------------------------------------------------
# qnn.attention: the deterministic integer attention primitive behind the
# BERT/ViT trace path (BASELINE config 4) and the unit of sequence
# parallelism (ring attention, parallel/ring_attention.py must match it
# bit-for-bit).  Semantics (all integer, pinned):
#   s    = q @ k^T                  (int32)
#   m_i  = max_j s_ij
#   p_ij = exp_table[clip(m_i - s_ij, 0, 255)]        (Q15, scores_scale)
#   sum_i = sum_j p_ij              (int32)
#   u_ij = (p_ij * 256 + sum_i//2) // sum_i           (0..256)
#   ctx  = u @ v                    (int32, two's-complement wraparound)
#   out  = requantize(ctx, v_scale/256 -> output_scale, UPWARD, int8)

@infer_rule("qnn.attention")
def _qattn_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (qs, _), (ks, _), (vs, _) = ins[:3]
    return tuple(qs), node.attrs.get("out_dtype", "int8")


@np_impl("qnn.attention")
def _qattn_np(q: np.ndarray, k: np.ndarray, v: np.ndarray, *, node: Node) -> np.ndarray:
    scores_scale = float(node.attrs["scores_scale"])
    out_scale = float(node.attrs["output_scale"])
    v_scale = float(node.attrs["v_scale"])
    table = softmax_exp_table(scores_scale)
    s = q.astype(np.int64) @ np.swapaxes(k.astype(np.int64), -1, -2)
    s = s.astype(np.int32)
    m = s.max(axis=-1, keepdims=True)
    d = np.clip(m.astype(np.int64) - s, 0, LUT_SIZE - 1)
    p = table[d].astype(np.int64)
    ssum = p.sum(axis=-1, keepdims=True)
    u = (p * 256 + ssum // 2) // ssum            # (..., S, S) in [0, 256]
    ctx = (u.astype(np.int64) @ v.astype(np.int64)).astype(np.int32)
    return requantize_np(
        ctx, v_scale / 256.0, 0, out_scale, 0,
        rounding=node.attrs.get("rounding", "UPWARD"),
        out_dtype=node.attrs.get("out_dtype", "int8"),
    )


# -- integer layer norm ------------------------------------------------------
# The reference lowers nn.layer_norm as a float TOPI op
# (`python/tvm/topi/nn/layer_norm.py`, registered in `src/relay/op/nn/nn.cc`);
# a float island breaks the integer-only trace contract AND costs ~50x on the
# BERT hot path (round-1 RESULTS.md).  qnn.layer_norm pins integer-only
# semantics shared bit-for-bit by the numpy oracle and the XLA/TPU backend:
#
#   t   = x - z_x                        (int32, |t| <= 255)
#   S   = sum(t); c = N*t - S            (int32; (x-mu)/s_x = c/N)
#   d   = rshift_round(c, k1); V = max(sum(d^2), 1)        (int32)
#   rsqrt(V) via the IEEE-754 bit pattern of float32(V) (int->f32 conversion
#       is correctly-rounded on every backend): exponent e, u = mant*2^odd
#       in [1,4), r = interp(RSQRT_TABLE, u) ~= 2^15/sqrt(u), so
#       1/sqrt(V) = r * 2^-15 * 2^-e2 with e2 = (e-127)>>1
#   y   = rshift_round(c, k2) * r * sign(gamma_ch)         (|y| < 2^30)
#   out = clip(qms(y, m_ch, s_ch - e2) + bias_ch)          (int8)
#
# where (m_ch, s_ch) encode |gamma_ch| * sqrt(N) * 2^(k2-15-k1) / s_out and
# bias_ch = round(beta_ch/s_out) + z_out.  k1/k2 are pinned per N so every
# intermediate fits int32 (k1: sum of squares; k2: the Q15 product).

LN_RSQRT_BITS = 15


def rsqrt_table() -> np.ndarray:
    """513-entry Q15 table of 2^15/sqrt(u) over u in [1, 4] (monotone,
    contiguous across the even/odd-exponent halves; entry 512 = u=4)."""
    i = np.arange(513, dtype=np.float64)
    u = np.where(i < 256, 1.0 + i / 256.0, 2.0 + (i - 256.0) / 128.0)
    return np.rint((1 << LN_RSQRT_BITS) / np.sqrt(u)).astype(np.int32)


_LN_RSQRT_TABLE = rsqrt_table()


def _ln_shift_plan(n_feat: int) -> tuple[int, int]:
    maxc = 2 * 255 * n_feat
    k1 = 0
    while n_feat * (-(-maxc // (1 << k1))) ** 2 >= (1 << 31):
        k1 += 1
    k2 = max(0, maxc.bit_length() + LN_RSQRT_BITS - 30)
    return k1, k2


def plan_layer_norm(gamma, beta, in_scale: float, in_zp: int,
                    out_scale: float, out_zp: int, n_feat: int) -> dict:
    """Fold float gamma/beta into qnn.layer_norm integer attrs."""
    from .fixed_point import fixed_point_multiplier_shift

    gamma = np.asarray(gamma, np.float64).ravel()
    beta = np.asarray(beta, np.float64).ravel()
    k1, k2 = _ln_shift_plan(n_feat)
    a_ch = (np.maximum(np.abs(gamma), 1e-12) * np.sqrt(n_feat)
            * 2.0 ** (k2 - LN_RSQRT_BITS - k1) / float(out_scale))
    ms, ss = zip(*(fixed_point_multiplier_shift(float(a)) for a in a_ch))
    bias = np.clip(np.rint(beta / float(out_scale)) + out_zp,
                   -(1 << 30), 1 << 30).astype(np.int64)
    return {
        "multiplier": [int(v) for v in ms],
        "shift": [int(v) for v in ss],
        "sign": [int(v) for v in np.where(gamma < 0, -1, 1)],
        "bias": [int(v) for v in bias],
        "k1": k1, "k2": k2,
        "input_zero_point": int(in_zp),
    }


def _rshift_round_np(v: np.ndarray, k: int) -> np.ndarray:
    if k <= 0:
        return v
    return (v + (1 << (k - 1))) >> k


@infer_rule("qnn.layer_norm")
def _qln_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (a, _) = ins[0]
    return tuple(a), node.attrs.get("out_dtype", "int8")


@np_impl("qnn.layer_norm")
def _qln_np(x: np.ndarray, *, node: Node) -> np.ndarray:
    a = node.attrs
    k1, k2 = int(a["k1"]), int(a["k2"])
    n = x.shape[-1]
    t = x.astype(np.int32) - np.int32(a.get("input_zero_point", 0))
    s = t.sum(axis=-1, keepdims=True, dtype=np.int32)
    c = np.int32(n) * t - s
    d = _rshift_round_np(c, k1)
    v = np.maximum((d * d).sum(axis=-1, keepdims=True, dtype=np.int32), 1)
    fb = np.float32(0) + v.astype(np.float32)      # IEEE RNE int->f32
    bits = fb.view(np.uint32).astype(np.int64)
    e = (bits >> 23).astype(np.int32)
    mant8 = ((bits >> 15) & 0xFF).astype(np.int32)
    frac = ((bits >> 7) & 0xFF).astype(np.int32)
    odd = (e - 127) & 1
    e2 = (e - 127) >> 1
    idx = odd * 256 + mant8
    t0 = _LN_RSQRT_TABLE[idx]
    t1 = _LN_RSQRT_TABLE[idx + 1]
    r = t0 - (((t0 - t1) * frac) >> 8)             # Q15
    y = _rshift_round_np(c, k2) * r                # int32 (< 2^30 by k2)
    sign = np.asarray(a["sign"], np.int32)
    y = y * sign
    # per-element fixed-point multiply: m_ch * 2^(s_ch - e2 - 31), UPWARD
    # (identical sequencing to fixed_point.q_multiply_shift with array shift)
    m_ch = np.asarray(a["multiplier"], np.int64)
    s_ch = np.asarray(a["shift"], np.int64)
    sh = s_ch - e2.astype(np.int64)                # broadcast rows x channels
    left = np.maximum(sh, 0)
    total_right = np.int64(31) + np.maximum(-sh, 0)
    prod = (y.astype(np.int64) << left) * m_ch
    prod = prod + (np.int64(1) << (total_right - 1))
    out = prod >> total_right
    out = out + np.asarray(a["bias"], np.int64)
    odt = a.get("out_dtype", "int8")
    return np.clip(out, dt.qmin(odt), dt.qmax(odt)).astype(odt)


# -- simulated (fake) quantization for QAT -----------------------------------
# The reference's qnn.simulated_quantize/dequantize
# (`src/relay/qnn/op/simulated_quantize.cc:63`,
# `python/tvm/relay/qnn/op/qnn.py:221`): float-in/float-out ops that mimic
# quantize (round + zp + clip, "always outputs float values") and
# dequantize, so a float model can be trained THROUGH the quantization
# nonlinearity.  The JAX impls (ops/jax_ops.py) carry a straight-through
# estimator gradient: identity (1/scale resp. scale) inside the
# representable range, zero where the clip saturates.

def _sim_scale_zp(node: Node, ndim: int):
    scale = np.asarray(node.attrs["scale"], np.float32)
    zp = np.asarray(node.attrs.get("zero_point", 0), np.int32)
    if scale.ndim > 0:
        axis = int(node.attrs.get("axis", -1))
        shape = [1] * ndim
        shape[axis] = -1
        scale = scale.reshape(shape)
        zp = zp.reshape(shape) if zp.ndim > 0 else zp
    return scale, zp


@infer_rule("qnn.simulated_quantize")
def _simq_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (a, _) = ins[0]
    return tuple(a), "float32"


@np_impl("qnn.simulated_quantize")
def _simq_np(x: np.ndarray, *, node: Node) -> np.ndarray:
    scale, zp = _sim_scale_zp(node, x.ndim)
    odt = node.attrs.get("out_dtype", "int8")
    q = np.rint(x.astype(np.float32) / scale) + zp
    return np.clip(q, dt.qmin(odt), dt.qmax(odt)).astype(np.float32)


@infer_rule("qnn.simulated_dequantize")
def _simdq_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    (a, _) = ins[0]
    return tuple(a), "float32"


@np_impl("qnn.simulated_dequantize")
def _simdq_np(x: np.ndarray, *, node: Node) -> np.ndarray:
    scale, zp = _sim_scale_zp(node, x.ndim)
    return ((x.astype(np.float32) - zp) * scale).astype(np.float32)
