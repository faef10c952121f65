"""JAX/XLA implementations of the op set — the TPU compute path.

Replaces the reference's entire TE/TIR/TOPI/codegen pipeline (SURVEY.md layers
5-10) for general ops: every registered op gets a jittable jnp implementation;
the executor stitches a whole graph into ONE XLA program, so XLA does fusion,
layout, and scheduling (the work of ~100 TIR/Relay passes).  Hot integer
kernels are overridden by Pallas implementations in ops/pallas/.

Integer ops are bit-exact vs the numpy oracle by construction: XLA integer
arithmetic is two's-complement wraparound, and the requantize path reuses
ops/fixed_point.py's jnp functions.

NOTE: importing this module enables jax x64 mode (int64 is required for exact
requantize intermediates).  All impls pin dtypes explicitly, so float-op
behavior does not depend on the x64 default-dtype change.
"""

from __future__ import annotations

import functools

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from ..ir.graph import Node  # noqa: E402
from ..ir.registry import jax_impl, register_op  # noqa: E402
from ..utils import dtypes as dt  # noqa: E402
from .fixed_point import (  # noqa: E402
    fixed_point_multiplier_shift,
    q_multiply_shift_jnp,
    q_multiply_shift_per_axis_jnp,
    requantize_jnp,
)
from .nn import _pad4, _pair  # noqa: E402

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _jdt(dtype: str):
    return jnp.dtype(dtype)


# -- conv / dense / matmul ---------------------------------------------------

def _conv2d_core(data, weight, node: Node, accum_int: bool,
                 xmax: int | None = None, wmax: int | None = None):
    strides = _pair(node.attrs.get("strides", (1, 1)))
    pt, pl, pb, pr = _pad4(node.attrs.get("padding", (0, 0, 0, 0)))
    dilation = _pair(node.attrs.get("dilation", (1, 1)))
    groups = int(node.attrs.get("groups", 1))
    if accum_int and xmax is not None and wmax is not None:
        # integer convs bypass the MXU in XLA; when every partial sum fits
        # exactly in float32 (reduction k * |x|max * |w|max < 2^24), the
        # float conv of the same values is bit-exact and MXU-fast.
        kh, kw = weight.shape[0], weight.shape[1]
        k = kh * kw * weight.shape[2]
        if k * xmax * wmax < (1 << 24):
            out = lax.conv_general_dilated(
                data.astype(jnp.float32), weight.astype(jnp.float32),
                window_strides=strides,
                padding=((pt, pb), (pl, pr)),
                rhs_dilation=dilation,
                dimension_numbers=_DIMNUMS,
                feature_group_count=groups,
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            return out.astype(jnp.int32)
    pref = jnp.int32 if accum_int else jnp.float32
    return lax.conv_general_dilated(
        data,
        weight,
        window_strides=strides,
        padding=((pt, pb), (pl, pr)),
        rhs_dilation=dilation,
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
        preferred_element_type=pref,
    )


@jax_impl("nn.conv2d")
def _conv2d_jax(data, weight, *, node: Node):
    integer = dt.is_int(str(data.dtype))
    small = str(data.dtype) in ("int8", "uint8") and str(weight.dtype) in ("int8", "uint8")
    out = _conv2d_core(data, weight, node, integer,
                       xmax=128 if small else None, wmax=128 if small else None)
    od = node.attrs.get("out_dtype")
    if od:
        return out.astype(_jdt(od))
    return out.astype(data.dtype if not integer else jnp.int32)


@jax_impl("qnn.conv2d")
def _qconv2d_jax(data, weight, *, node: Node):
    izp = int(node.attrs.get("input_zero_point", 0))
    kzp = node.attrs.get("kernel_zero_point", 0)
    if node.attrs.get("out_dtype") == "int64":
        # W8A16: accumulate past int32 (int64 emulated — capability path)
        d = data.astype(jnp.int64) - jnp.int64(izp)
        w = weight.astype(jnp.int64)
        if np.ndim(kzp) > 0:
            w = w - jnp.asarray(np.asarray(kzp, np.int64).reshape(1, 1, 1, -1))
        elif int(kzp) != 0:
            w = w - jnp.int64(kzp)
        from jax import lax as _lax

        from .nn import _pad4 as _p4, _pair as _pr

        pt, pl, pb, pr = _p4(node.attrs.get("padding", (0, 0, 0, 0)))
        return _lax.conv_general_dilated(
            d, w, window_strides=_pr(node.attrs.get("strides", (1, 1))),
            padding=((pt, pb), (pl, pr)),
            rhs_dilation=_pr(node.attrs.get("dilation", (1, 1))),
            dimension_numbers=_DIMNUMS,
            feature_group_count=int(node.attrs.get("groups", 1)),
            preferred_element_type=jnp.int64)
    d = data.astype(jnp.int32) - jnp.int32(izp)
    w = weight.astype(jnp.int32)
    kzp_max = int(np.max(np.abs(kzp))) if np.ndim(kzp) > 0 else abs(int(kzp))
    if np.ndim(kzp) > 0:
        w = w - jnp.asarray(np.asarray(kzp, np.int32).reshape(1, 1, 1, -1))
    elif int(kzp) != 0:
        w = w - jnp.int32(kzp)
    out = _conv2d_core(d, w, node, True,
                       xmax=128 + abs(izp), wmax=128 + kzp_max)
    return out.astype(_jdt(node.attrs.get("out_dtype", "int32")))


def _conv2d_transpose_core(data, weight, node: Node, accum_int: bool):
    kh, kw = weight.shape[0], weight.shape[1]
    sh, sw = _pair(node.attrs.get("strides", (1, 1)))
    pt, pl, pb, pr = _pad4(node.attrs.get("padding", (0, 0, 0, 0)))
    oph, opw = _pair(node.attrs.get("output_padding", (0, 0)))
    rhs = weight[::-1, ::-1, :, :]
    pref = jnp.int32 if accum_int else jnp.float32
    return lax.conv_general_dilated(
        data,
        rhs,
        window_strides=(1, 1),
        padding=((kh - 1 - pt, kh - 1 - pb + oph), (kw - 1 - pl, kw - 1 - pr + opw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=pref,
    )


@jax_impl("nn.conv2d_transpose")
def _conv2d_t_jax(data, weight, *, node: Node):
    integer = dt.is_int(str(data.dtype))
    out = _conv2d_transpose_core(data, weight, node, integer)
    od = node.attrs.get("out_dtype")
    if od:
        return out.astype(_jdt(od))
    return out.astype(data.dtype if not integer else jnp.int32)


@jax_impl("qnn.conv2d_transpose")
def _qconv2d_t_jax(data, weight, *, node: Node):
    izp = int(node.attrs.get("input_zero_point", 0))
    kzp = int(node.attrs.get("kernel_zero_point", 0))
    d = data.astype(jnp.int32) - jnp.int32(izp)
    w = weight.astype(jnp.int32) - jnp.int32(kzp)
    out = _conv2d_transpose_core(d, w, node, True)
    return out.astype(_jdt(node.attrs.get("out_dtype", "int32")))


@jax_impl("nn.dense")
def _dense_jax(data, weight, *, node: Node):
    integer = dt.is_int(str(data.dtype))
    pref = jnp.int32 if integer else jnp.float32
    out = jnp.matmul(data, weight, preferred_element_type=pref)
    od = node.attrs.get("out_dtype")
    if od:
        return out.astype(_jdt(od))
    return out.astype(data.dtype if not integer else jnp.int32)


@jax_impl("qnn.dense")
def _qdense_jax(data, weight, *, node: Node):
    izp = int(node.attrs.get("input_zero_point", 0))
    kzp = node.attrs.get("kernel_zero_point", 0)
    if node.attrs.get("out_dtype") == "int64":
        d = data.astype(jnp.int64) - jnp.int64(izp)
        w = weight.astype(jnp.int64)
        if np.ndim(kzp) > 0:
            w = w - jnp.asarray(np.asarray(kzp, np.int64).reshape(1, -1))
        elif int(kzp) != 0:
            w = w - jnp.int64(kzp)
        return jnp.matmul(d, w, preferred_element_type=jnp.int64)
    d = data.astype(jnp.int32) - jnp.int32(izp)
    w = weight.astype(jnp.int32)
    if np.ndim(kzp) > 0:
        w = w - jnp.asarray(np.asarray(kzp, np.int32).reshape(1, -1))
    elif int(kzp) != 0:
        w = w - jnp.int32(kzp)
    out = jnp.matmul(d, w, preferred_element_type=jnp.int32)
    return out.astype(_jdt(node.attrs.get("out_dtype", "int32")))


def _bmm(a, b, node: Node, azp=0, bzp=0):
    integer = dt.is_int(str(a.dtype))
    x = a.astype(jnp.int32) - jnp.int32(azp) if (integer and azp) else a
    y = b.astype(jnp.int32) - jnp.int32(bzp) if (integer and bzp) else b
    if integer and (azp or bzp):
        x = x if azp else a.astype(jnp.int32)
        y = y if bzp else b.astype(jnp.int32)
    if node.attrs.get("transpose_a", False):
        x = jnp.swapaxes(x, -1, -2)
    if node.attrs.get("transpose_b", False):
        y = jnp.swapaxes(y, -1, -2)
    if not integer:
        return jnp.matmul(x, y, preferred_element_type=jnp.float32), integer
    k = x.shape[-1]
    amax = 128 + abs(int(azp))
    bmax = 128 + abs(int(bzp))
    if (
        str(a.dtype) in ("int8", "uint8")
        and k * amax * bmax < (1 << 24)
    ):
        # int8 batched matmuls don't hit the MXU in XLA; a float32 matmul of
        # the same values IS bit-exact here (int8 values are exact in
        # bf16/f32; every product <= 2^14+eps and every partial sum < 2^24,
        # both exactly representable), and runs at MXU speed.
        out = jnp.matmul(
            x.astype(jnp.float32), y.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
        return out, integer
    out = jnp.matmul(x, y, preferred_element_type=jnp.int32)
    return out, integer


@jax_impl("nn.batch_matmul")
def _bmm_jax(a, b, *, node: Node):
    out, integer = _bmm(a, b, node)
    od = node.attrs.get("out_dtype")
    if od:
        return out.astype(_jdt(od))
    return out.astype(a.dtype if not integer else jnp.int32)


@jax_impl("qnn.batch_matmul")
def _qbmm_jax(a, b, *, node: Node):
    out, _ = _bmm(
        a, b, node,
        int(node.attrs.get("lhs_zero_point", 0)),
        int(node.attrs.get("rhs_zero_point", 0)),
    )
    return out.astype(_jdt(node.attrs.get("out_dtype", "int32")))


@jax_impl("nn.bias_add")
def _bias_add_jax(data, bias, *, node: Node):
    axis = int(node.attrs.get("axis", -1))
    shape = [1] * data.ndim
    shape[axis] = -1
    return data + bias.reshape(shape).astype(data.dtype)


# -- pooling -----------------------------------------------------------------

def _pool_padding(node: Node, h, w, kh, kw):
    sh, sw = _pair(node.attrs.get("strides", (1, 1)))
    pt, pl, pb, pr = _pad4(node.attrs.get("padding", (0, 0, 0, 0)))
    if node.attrs.get("ceil_mode", False):
        oh = -((h + pt + pb - kh) // -sh) + 1
        ow = -((w + pl + pr - kw) // -sw) + 1
        pb = max(pb, (oh - 1) * sh + kh - h - pt)
        pr = max(pr, (ow - 1) * sw + kw - w - pl)
    return (sh, sw), (pt, pl, pb, pr)


@jax_impl("nn.max_pool2d")
def _max_pool2d_jax(data, *, node: Node):
    # tap-max formulation: kh*kw strided slices folded with jnp.maximum.
    # Exactly reduce_window's semantics, but fully vectorized — XLA:TPU's
    # int8 reduce_window lowers to a scalar loop (measured 1.8 ms on
    # ResNet-50's 8x112x112x64 stem pool vs ~40 us for the tap form).
    kh, kw = _pair(node.attrs["pool_size"])
    n, h, w, c = data.shape
    (sh, sw), (pt, pl, pb, pr) = _pool_padding(node, h, w, kh, kw)
    if dt.is_int(str(data.dtype)):
        init = int(np.iinfo(np.dtype(str(data.dtype))).min)
    else:
        init = -np.inf
    oh = (h + pt + pb - kh) // sh + 1
    ow = (w + pl + pr - kw) // sw + 1
    xp = jnp.pad(data, ((0, 0), (pt, pb), (pl, pr), (0, 0)),
                 constant_values=init)
    out = None
    for i in range(kh):
        for j in range(kw):
            tap = lax.slice(
                xp, (0, i, j, 0),
                (n, i + (oh - 1) * sh + 1, j + (ow - 1) * sw + 1, c),
                (1, sh, sw, 1))
            out = tap if out is None else jnp.maximum(out, tap)
    return out


def _int_avg_jnp(total, count):
    half = count // 2 if isinstance(count, int) else count // 2
    return jnp.where(total >= 0, (total + half) // count, -((-total + half) // count))


def _sum_pool(data, kh, kw, sh, sw, pads):
    return lax.reduce_window(
        data, jnp.asarray(0, dtype=data.dtype), lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (pads[0], pads[2]), (pads[1], pads[3]), (0, 0)),
    )


@jax_impl("nn.avg_pool2d")
def _avg_pool2d_jax(data, *, node: Node):
    kh, kw = _pair(node.attrs["pool_size"])
    (sh, sw), pads = _pool_padding(node, data.shape[1], data.shape[2], kh, kw)
    integer = dt.is_int(str(data.dtype))
    acc = data.astype(jnp.int64 if integer else jnp.float32)
    total = _sum_pool(acc, kh, kw, sh, sw, pads)
    cip = node.attrs.get("count_include_pad", False)
    if cip or pads == (0, 0, 0, 0):
        count = kh * kw
        out = _int_avg_jnp(total, count) if integer else total / count
    else:
        ones = jnp.ones(data.shape, dtype=jnp.int64 if integer else jnp.float32)
        count = _sum_pool(ones, kh, kw, sh, sw, pads)
        out = _int_avg_jnp(total, count) if integer else total / count
    return out.astype(data.dtype)


@jax_impl("qnn.avg_pool2d")
def _qavg_pool2d_jax(data, *, node: Node):
    izp = int(node.attrs.get("input_zero_point", 0))
    v = data.astype(jnp.int32) - jnp.int32(izp)
    pooled = _avg_pool2d_jax(v, node=node)
    return requantize_jnp(
        pooled, float(node.attrs["input_scale"]), 0,
        float(node.attrs["output_scale"]),
        int(node.attrs.get("output_zero_point", 0)),
        rounding=node.attrs.get("rounding", "UPWARD"),
        out_dtype=node.attrs.get("out_dtype", str(data.dtype)),
    )


@jax_impl("nn.global_avg_pool2d")
def _gap_jax(data, *, node: Node):
    keepdims = node.attrs.get("keepdims", True)
    if dt.is_int(str(data.dtype)):
        total = data.astype(jnp.int64).sum(axis=(1, 2), keepdims=keepdims)
        return _int_avg_jnp(total, data.shape[1] * data.shape[2]).astype(data.dtype)
    return data.astype(jnp.float32).mean(axis=(1, 2), keepdims=keepdims).astype(data.dtype)


@jax_impl("nn.global_max_pool2d")
def _gmp_jax(data, *, node: Node):
    return data.max(axis=(1, 2), keepdims=node.attrs.get("keepdims", True))


@jax_impl("nn.adaptive_avg_pool2d")
def _aap_jax(data, *, node: Node):
    n, h, w, c = data.shape
    oh, ow = _pair(node.attrs["output_size"])
    integer = dt.is_int(str(data.dtype))
    acc = jnp.int64 if integer else jnp.float32
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, -((-(i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, -((-(j + 1) * w) // ow)
            patch = data[:, h0:h1, w0:w1, :].astype(acc)
            tot = patch.sum(axis=(1, 2))
            cnt = (h1 - h0) * (w1 - w0)
            cols.append(_int_avg_jnp(tot, cnt) if integer else tot / cnt)
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1).astype(data.dtype)


# -- normalization -----------------------------------------------------------

@jax_impl("nn.batch_norm")
def _bn_jax(data, gamma, beta, mean, var, *, node: Node):
    eps = np.float32(node.attrs.get("epsilon", 1e-5))
    axis = int(node.attrs.get("axis", -1))
    shape = [1] * data.ndim
    shape[axis] = -1
    inv = (1.0 / jnp.sqrt(var.astype(jnp.float32) + eps)).astype(jnp.float32)
    out = (data.astype(jnp.float32) - mean.reshape(shape)) * (gamma * inv).reshape(shape) + beta.reshape(shape)
    return out.astype(data.dtype)


@jax_impl("nn.layer_norm")
def _ln_jax(data, gamma, beta, *, node: Node):
    axis = int(node.attrs.get("axis", -1))
    eps = np.float32(node.attrs.get("epsilon", 1e-5))
    x = data.astype(jnp.float32)
    mu = x.mean(axis=axis, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=axis, keepdims=True)
    shape = [1] * data.ndim
    shape[axis] = -1
    out = (x - mu) / jnp.sqrt(var + eps) * gamma.reshape(shape) + beta.reshape(shape)
    return out.astype(data.dtype)


# -- activations -------------------------------------------------------------

@jax_impl("nn.relu")
def _relu_jax(x, *, node: Node):
    return jnp.maximum(x, jnp.zeros((), dtype=x.dtype))


@jax_impl("nn.leaky_relu")
def _lrelu_jax(x, *, node: Node):
    alpha = np.float32(node.attrs.get("alpha", 0.01))
    return jnp.where(x >= 0, x, (x.astype(jnp.float32) * alpha).astype(x.dtype))


@jax_impl("nn.prelu")
def _prelu_jax(x, alpha, *, node: Node):
    axis = int(node.attrs.get("axis", -1))
    shape = [1] * x.ndim
    shape[axis] = -1
    return jnp.where(x >= 0, x, x * alpha.reshape(shape)).astype(x.dtype)


@jax_impl("nn.softmax")
def _softmax_jax(x, *, node: Node):
    return jax.nn.softmax(x.astype(jnp.float32), axis=int(node.attrs.get("axis", -1))).astype(x.dtype)


@jax_impl("nn.log_softmax")
def _log_softmax_jax(x, *, node: Node):
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=int(node.attrs.get("axis", -1))).astype(x.dtype)


@jax_impl("nn.dropout")
def _dropout_jax(x, *, node: Node):
    return x


@jax_impl("nn.gelu")
def _gelu_jax(x, *, node: Node):
    approx = node.attrs.get("approximate", "none") == "tanh"
    return jax.nn.gelu(x.astype(jnp.float32), approximate=approx).astype(x.dtype)


@jax_impl("nn.silu")
def _silu_jax(x, *, node: Node):
    x32 = x.astype(jnp.float32)
    return (x32 * jax.nn.sigmoid(x32)).astype(x.dtype)


for _n, _f in {
    "sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh, "exp": jnp.exp, "log": jnp.log,
    "sqrt": jnp.sqrt, "erf": lambda v: jax.scipy.special.erf(v),
    "floor": jnp.floor, "ceil": jnp.ceil,
}.items():
    def _mk(f):
        def impl(x, *, node: Node):
            return f(x.astype(jnp.float32)).astype(x.dtype)
        return impl
    register_op(_n, jax_impl=_mk(_f))


@jax_impl("negative")
def _neg_jax(x, *, node: Node):
    return jnp.negative(x)


@jax_impl("abs")
def _abs_jax(x, *, node: Node):
    return jnp.abs(x)


@jax_impl("sign")
def _sign_jax(x, *, node: Node):
    return jnp.sign(x)


@jax_impl("rsqrt")
def _rsqrt_jax(x, *, node: Node):
    return lax.rsqrt(x.astype(jnp.float32)).astype(x.dtype)


@jax_impl("round")
def _round_jax(x, *, node: Node):
    return jnp.rint(x.astype(jnp.float32)).astype(x.dtype)


@jax_impl("copy")
def _copy_jax(x, *, node: Node):
    return x


@jax_impl("clip")
def _clip_jax(x, *, node: Node):
    a_min, a_max = node.attrs["a_min"], node.attrs["a_max"]
    if dt.is_int(str(x.dtype)):
        return jnp.clip(x, int(a_min), int(a_max)).astype(x.dtype)
    return jnp.clip(x, np.float32(a_min), np.float32(a_max)).astype(x.dtype)


# -- elementwise binary ------------------------------------------------------

_JBIN = {
    "add": jnp.add, "subtract": jnp.subtract, "multiply": jnp.multiply,
    "maximum": jnp.maximum, "minimum": jnp.minimum,
    "floor_divide": jnp.floor_divide, "mod": jnp.mod,
    "bitwise_and": jnp.bitwise_and, "bitwise_or": jnp.bitwise_or,
    "bitwise_xor": jnp.bitwise_xor,
    "left_shift": jnp.left_shift, "right_shift": jnp.right_shift,
    "power": jnp.power,
}
for _n, _f in _JBIN.items():
    def _mkb(f):
        def impl(a, b, *, node: Node):
            out_dt = _jdt(dt.promote(str(a.dtype), str(b.dtype)))
            return f(a.astype(out_dt), b.astype(out_dt))
        return impl
    register_op(_n, jax_impl=_mkb(_f))


@jax_impl("divide")
def _div_jax(a, b, *, node: Node):
    out_dt = dt.promote(str(a.dtype), str(b.dtype))
    if dt.is_int(out_dt):
        # truncating division (C semantics) to match the oracle
        q = lax.div(a.astype(jnp.int64), b.astype(jnp.int64))
        return q.astype(_jdt(out_dt))
    return a.astype(_jdt(out_dt)) / b.astype(_jdt(out_dt))


for _n, _f in {
    "equal": jnp.equal, "not_equal": jnp.not_equal,
    "less": jnp.less, "less_equal": jnp.less_equal,
    "greater": jnp.greater, "greater_equal": jnp.greater_equal,
    "logical_and": jnp.logical_and, "logical_or": jnp.logical_or,
}.items():
    def _mkc(f):
        def impl(a, b, *, node: Node):
            return f(a, b)
        return impl
    register_op(_n, jax_impl=_mkc(_f))


@jax_impl("logical_not")
def _lnot_jax(a, *, node: Node):
    return jnp.logical_not(a)


@jax_impl("where")
def _where_jax(c, a, b, *, node: Node):
    return jnp.where(c, a, b)


# -- shape ops ---------------------------------------------------------------

@jax_impl("reshape")
def _reshape_jax(a, *, node: Node):
    from .nn import _reshape_rel

    shape, _ = _reshape_rel(node, [(tuple(a.shape), str(a.dtype))])
    return a.reshape(shape)


@jax_impl("nn.batch_flatten")
def _bflat_jax(a, *, node: Node):
    return a.reshape(a.shape[0], -1)


@jax_impl("transpose")
def _transpose_jax(a, *, node: Node):
    return jnp.transpose(a, node.attrs.get("axes"))


@jax_impl("squeeze")
def _squeeze_jax(a, *, node: Node):
    axes = node.attrs.get("axis")
    if axes is not None and not isinstance(axes, (tuple, list)):
        axes = (axes,)
    return jnp.squeeze(a, axis=tuple(axes) if axes is not None else None)


@jax_impl("expand_dims")
def _expand_jax(a, *, node: Node):
    axis = int(node.attrs["axis"]) % (a.ndim + 1)
    num = int(node.attrs.get("num_newaxis", 1))
    shape = a.shape[:axis] + (1,) * num + a.shape[axis:]
    return a.reshape(shape)


@jax_impl("concatenate")
def _concat_jax(*args, node: Node):
    return jnp.concatenate(args, axis=int(node.attrs.get("axis", 0)))


@jax_impl("split")
def _split_jax(a, *, node: Node):
    axis = int(node.attrs.get("axis", 0))
    iops = node.attrs["indices_or_sections"]
    if not isinstance(iops, int):
        iops = list(iops)
    return list(jnp.split(a, iops, axis=axis))


@jax_impl("strided_slice")
def _sslice_jax(a, *, node: Node):
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


@jax_impl("take")
def _take_jax(a, indices, *, node: Node):
    axis = node.attrs.get("axis")
    mode = node.attrs.get("mode", "clip")
    jmode = {"clip": "clip", "wrap": "wrap", "fast": None}.get(mode, "clip")
    # Embedding pattern (2-D table, axis 0): jnp.take lowers to scalar
    # gathers on TPU (~3.5 ns/element — 1.37 ms for BERT's token embedding).
    # Row-select is EXACT as a one-hot matmul (one unit weight per row; the
    # zero terms vanish identically for finite values), and the MXU does it
    # at memory speed.  Bounded by one-hot size to avoid memory blow-up.
    if (axis is not None and int(axis) == 0 and a.ndim == 2
            and jnp.issubdtype(indices.dtype, jnp.integer)
            and a.shape[0] >= 256
            and int(np.prod(indices.shape)) * a.shape[0] <= (1 << 28)):
        v = a.shape[0]
        flat = indices.reshape(-1)
        if jmode == "clip":
            flat = jnp.clip(flat, 0, v - 1)
        elif jmode == "wrap":
            flat = flat % v
        onehot = (flat[:, None] ==
                  jnp.arange(v, dtype=flat.dtype)[None, :])
        if jnp.issubdtype(a.dtype, jnp.integer):
            out = jnp.dot(onehot.astype(jnp.int8), a.astype(jnp.int32),
                          preferred_element_type=jnp.int32).astype(a.dtype)
        else:
            out = jnp.dot(onehot.astype(a.dtype), a,
                          preferred_element_type=jnp.float32).astype(a.dtype)
        return out.reshape(*indices.shape, a.shape[1])
    return jnp.take(a, indices, axis=None if axis is None else int(axis), mode=jmode)


@jax_impl("gather")
def _gather_jax(a, indices, *, node: Node):
    axis = int(node.attrs.get("axis", 0))
    return jnp.take_along_axis(a, indices.astype(jnp.int64), axis=axis)


@jax_impl("broadcast_to")
def _bto_jax(a, *, node: Node):
    return jnp.broadcast_to(a, tuple(int(s) for s in node.attrs["shape"]))


@jax_impl("tile")
def _tile_jax(a, *, node: Node):
    return jnp.tile(a, tuple(int(r) for r in node.attrs["reps"]))


@jax_impl("nn.pad")
def _pad_jax(a, *, node: Node):
    pw = [(int(b), int(e)) for b, e in node.attrs["pad_width"]]
    mode = node.attrs.get("pad_mode", "constant")
    if mode == "constant":
        val = node.attrs.get("pad_value", 0)
        if dt.is_int(str(a.dtype)):
            val = int(val)
        return jnp.pad(a, pw, constant_values=val)
    return jnp.pad(a, pw, mode={"edge": "edge", "reflect": "reflect"}[mode])


@jax_impl("cast")
def _cast_jax(a, *, node: Node):
    target = node.attrs["dtype"]
    if dt.is_float(str(a.dtype)) and dt.is_int(target):
        return jnp.trunc(a).astype(_jdt(target))
    return a.astype(_jdt(target))


# -- reductions --------------------------------------------------------------

def _jnorm_axes(node: Node, ndim: int):
    axes = node.attrs.get("axis")
    if axes is None:
        return None
    if not isinstance(axes, (tuple, list)):
        axes = (axes,)
    return tuple(ax % ndim for ax in axes)


for _n, _f in {"sum": jnp.sum, "max": jnp.max, "min": jnp.min, "prod": jnp.prod,
               "mean": jnp.mean, "all": jnp.all, "any": jnp.any}.items():
    def _mkr(f, name):
        def impl(a, *, node: Node):
            axes = _jnorm_axes(node, a.ndim)
            keepdims = bool(node.attrs.get("keepdims", False))
            if name == "mean" and not dt.is_float(str(a.dtype)):
                out = f(a.astype(jnp.float64), axis=axes, keepdims=keepdims)
                return out.astype(a.dtype)
            if name in ("sum", "prod") and dt.is_int(str(a.dtype)):
                out = f(a.astype(jnp.int64), axis=axes, keepdims=keepdims)
                return out.astype(
                    "int32" if str(a.dtype) in ("int8", "uint8", "int16", "int32") else a.dtype
                )
            out = f(a.astype(jnp.float32) if name == "mean" else a, axis=axes, keepdims=keepdims)
            if name in ("all", "any"):
                return out
            return out.astype(a.dtype)
        return impl
    register_op(_n, jax_impl=_mkr(_f, _n))


@jax_impl("argmax")
def _argmax_jax(a, *, node: Node):
    axes = _jnorm_axes(node, a.ndim)
    ax = axes[0] if axes else None
    out = jnp.argmax(a, axis=ax)
    if node.attrs.get("keepdims", False) and ax is not None:
        out = jnp.expand_dims(out, ax)
    return out.astype(jnp.int32)


@jax_impl("argmin")
def _argmin_jax(a, *, node: Node):
    axes = _jnorm_axes(node, a.ndim)
    ax = axes[0] if axes else None
    out = jnp.argmin(a, axis=ax)
    if node.attrs.get("keepdims", False) and ax is not None:
        out = jnp.expand_dims(out, ax)
    return out.astype(jnp.int32)


@jax_impl("variance")
def _var_jax(a, *, node: Node):
    axes = _jnorm_axes(node, a.ndim)
    return jnp.var(a.astype(jnp.float32), axis=axes,
                   keepdims=bool(node.attrs.get("keepdims", False))).astype(a.dtype)


# -- misc --------------------------------------------------------------------

@jax_impl("one_hot")
def _onehot_jax(indices, *, node: Node):
    depth = int(node.attrs["depth"])
    on = node.attrs.get("on_value", 1)
    off = node.attrs.get("off_value", 0)
    dtype = node.attrs.get("dtype", "float32")
    axis = int(node.attrs.get("axis", -1))
    out = jax.nn.one_hot(indices, depth, axis=axis, dtype=_jdt(dtype))
    if on != 1 or off != 0:
        out = out * jnp.asarray(on - off, dtype=_jdt(dtype)) + jnp.asarray(off, dtype=_jdt(dtype))
    return out


@jax_impl("image.resize2d")
def _resize2d_jax(a, *, node: Node):
    from .nn import _resize2d_common

    return _resize2d_common(a, node)


@jax_impl("nn.depth_to_space")
def _d2s_jax(a, *, node: Node):
    n, h, w, c = a.shape
    b = int(node.attrs["block_size"])
    mode = node.attrs.get("mode", "DCR")
    if mode == "DCR":
        x = a.reshape(n, h, w, b, b, c // (b * b))
    else:
        x = a.reshape(n, h, w, c // (b * b), b, b).transpose(0, 1, 2, 4, 5, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * b, w * b, c // (b * b))


@jax_impl("nn.space_to_depth")
def _s2d_jax(a, *, node: Node):
    n, h, w, c = a.shape
    b = int(node.attrs["block_size"])
    x = a.reshape(n, h // b, b, w // b, b, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // b, w // b, b * b * c)


# -- qnn ---------------------------------------------------------------------

@jax_impl("qnn.quantize")
def _quantize_jax(x, *, node: Node):
    out_dtype = node.attrs.get("out_dtype", "int8")
    scale = np.asarray(node.attrs["scale"], dtype=np.float32)
    zp = np.asarray(node.attrs.get("zero_point", 0), dtype=np.int32)
    axis = int(node.attrs.get("axis", -1))
    if scale.ndim > 0:
        shape = [1] * x.ndim
        shape[axis] = -1
        scale = scale.reshape(shape)
        zp = zp.reshape(shape) if zp.ndim > 0 else zp
    scaled = jnp.rint(x.astype(jnp.float32) / jnp.asarray(scale))
    shifted = scaled + jnp.asarray(zp, dtype=jnp.float32)
    lo, hi = dt.qmin(out_dtype), dt.qmax(out_dtype)
    return jnp.clip(shifted, lo, hi).astype(_jdt(out_dtype))


@jax_impl("qnn.dequantize")
def _dequantize_jax(x, *, node: Node):
    scale = np.asarray(node.attrs["scale"], dtype=np.float32)
    zp = np.asarray(node.attrs.get("zero_point", 0), dtype=np.int32)
    axis = int(node.attrs.get("axis", -1))
    if scale.ndim > 0:
        shape = [1] * x.ndim
        shape[axis] = -1
        scale = scale.reshape(shape)
        zp = zp.reshape(shape) if zp.ndim > 0 else zp
    return ((x.astype(jnp.int32) - jnp.asarray(zp)).astype(jnp.float32) * jnp.asarray(scale)).astype(jnp.float32)


@jax_impl("qnn.requantize")
def _requantize_jax(x, *, node: Node):
    return requantize_jnp(
        x,
        node.attrs["input_scale"],
        int(node.attrs.get("input_zero_point", 0)),
        float(node.attrs["output_scale"]),
        int(node.attrs.get("output_zero_point", 0)),
        axis=int(node.attrs.get("axis", -1)),
        rounding=node.attrs.get("rounding", "UPWARD"),
        out_dtype=node.attrs.get("out_dtype", "int8"),
    )


def _requant_to_out_jnp(x, scale, zp, node: Node):
    oscale = float(node.attrs["output_scale"])
    ozp = int(node.attrs.get("output_zero_point", 0))
    scale_arr = np.asarray(scale, dtype=np.float64)
    if scale_arr.ndim == 0 and float(scale_arr) == oscale and int(zp) == ozp:
        return x.astype(jnp.int32)
    return requantize_jnp(
        x, scale, int(zp), oscale, ozp,
        axis=int(node.attrs.get("axis", -1)),
        rounding=node.attrs.get("rounding", "UPWARD"),
        out_dtype="int32",
    )


def _qadd_like_jax(is_add: bool):
    def impl(lhs, rhs, *, node: Node):
        out_dtype = node.attrs.get("out_dtype", "int8")
        ozp = int(node.attrs.get("output_zero_point", 0))
        ql = _requant_to_out_jnp(lhs, node.attrs["lhs_scale"], node.attrs.get("lhs_zero_point", 0), node)
        qr = _requant_to_out_jnp(rhs, node.attrs["rhs_scale"], node.attrs.get("rhs_zero_point", 0), node)
        out = (ql + qr) if is_add else (ql - qr)
        out = out - jnp.int32(ozp) if is_add else out + jnp.int32(ozp)
        lo, hi = dt.qmin(out_dtype), dt.qmax(out_dtype)
        return jnp.clip(out, lo, hi).astype(_jdt(out_dtype))

    return impl


register_op("qnn.add", jax_impl=_qadd_like_jax(True))
register_op("qnn.subtract", jax_impl=_qadd_like_jax(False))


@jax_impl("qnn.mul")
def _qmul_jax(lhs, rhs, *, node: Node):
    out_dtype = node.attrs.get("out_dtype", "int8")
    lzp = int(node.attrs.get("lhs_zero_point", 0))
    rzp = int(node.attrs.get("rhs_zero_point", 0))
    l = lhs.astype(jnp.int32) - jnp.int32(lzp)
    r = rhs.astype(jnp.int32) - jnp.int32(rzp)
    prod = l * r  # int32 wraparound == int64-then-truncate (mod 2^32)
    new_scale = float(np.asarray(node.attrs["lhs_scale"]).item()) * float(
        np.asarray(node.attrs["rhs_scale"]).item()
    )
    return requantize_jnp(
        prod, new_scale, 0,
        float(node.attrs["output_scale"]),
        int(node.attrs.get("output_zero_point", 0)),
        rounding=node.attrs.get("rounding", "UPWARD"),
        out_dtype=out_dtype,
    )


@jax_impl("qnn.concatenate")
def _qconcat_jax(*args, node: Node):
    scales = node.attrs["input_scales"]
    zps = node.attrs["input_zero_points"]
    oscale = float(node.attrs["output_scale"])
    ozp = int(node.attrs.get("output_zero_point", 0))
    out_dtype = node.attrs.get("out_dtype", str(args[0].dtype))
    rounding = node.attrs.get("rounding", "UPWARD")
    parts = []
    for x, s, z in zip(args, scales, zps):
        if float(s) == oscale and int(z) == ozp:
            parts.append(x.astype(_jdt(out_dtype)))
        else:
            parts.append(
                requantize_jnp(x, float(s), int(z), oscale, ozp,
                               rounding=rounding, out_dtype=out_dtype)
            )
    return jnp.concatenate(parts, axis=int(node.attrs.get("axis", 0)))


@jax_impl("qnn.leaky_relu")
def _qlrelu_jax(x, *, node: Node):
    alpha = float(node.attrs.get("alpha", 0.01))
    iscale = float(node.attrs["input_scale"])
    izp = int(node.attrs.get("input_zero_point", 0))
    oscale = float(node.attrs["output_scale"])
    ozp = int(node.attrs.get("output_zero_point", 0))
    out_dtype = node.attrs.get("out_dtype", str(x.dtype))
    rounding = node.attrs.get("rounding", "UPWARD")
    pos = requantize_jnp(x, iscale, izp, oscale, ozp, rounding=rounding, out_dtype="int32")
    m, s = fixed_point_multiplier_shift(alpha * iscale / oscale)
    neg = q_multiply_shift_jnp(x.astype(jnp.int32) - jnp.int32(izp), m, s, rounding) + jnp.int32(ozp)
    out = jnp.where(x.astype(jnp.int32) >= izp, pos, neg)
    lo, hi = dt.qmin(out_dtype), dt.qmax(out_dtype)
    return jnp.clip(out, lo, hi).astype(_jdt(out_dtype))


@jax_impl("fixed_point_multiply")
def _fpm_jax(a, *, node: Node):
    return q_multiply_shift_jnp(
        a.astype(jnp.int32),
        int(node.attrs["multiplier"]),
        int(node.attrs["shift"]),
        node.attrs.get("rounding", "UPWARD"),
    )


@jax_impl("fixed_point_multiply_per_axis")
def _fpm_pa_jax(a, *, node: Node):
    return q_multiply_shift_per_axis_jnp(
        a.astype(jnp.int32),
        np.asarray(node.attrs["multipliers"], dtype=np.int64),
        np.asarray(node.attrs["shifts"], dtype=np.int64),
        int(node.attrs["axis"]),
        node.attrs.get("rounding", "UPWARD"),
    )



def _lut_select(table_np: np.ndarray, idx):
    """Small-table lookup as a packed select-sum.

    XLA lowers jnp.take on TPU to SCALAR gathers (~8 ns/element — measured
    12.8 ms for a (512,3072) int8 LUT, the entire BERT bottleneck); a
    where-chain over table entries is pure vectorized VPU work, ~30x faster.

    The chain length is cut a further 4x (int8 tables) / 2x (int16) by
    PACKING adjacent entries into one 32-bit word: select over the packed
    words, then extract the target lane with an elementwise variable shift
    (data-dependent shifts are fine in XLA — only Mosaic forbids them).
    Bit-identical to the naive chain: packing/extraction is exact.
    table_np must be a CONCRETE numpy array."""
    table_np = np.asarray(table_np).astype(np.int64)
    n = int(table_np.shape[0])
    idx = idx.astype(jnp.int32)
    lo, hi = int(table_np.min()), int(table_np.max())
    signed = lo < 0
    if (-128 <= lo and hi <= 127) if signed else hi <= 255:
        p, bits = 4, 8
    elif (-32768 <= lo and hi <= 32767) if signed else hi <= 65535:
        p, bits = 2, 16   # NB: the Q15 softmax table's 32768 fits unsigned
    else:
        p, bits = 1, 32
    if p == 1:
        out = jnp.zeros(idx.shape, jnp.int32)
        for k in range(n):
            out = jnp.where(idx == jnp.int32(k),
                            jnp.int32(int(table_np[k])), out)
        return out
    mask = (1 << bits) - 1
    npk = -(-n // p)
    packed = np.zeros(npk, np.uint32)
    for j in range(p):
        ent = (table_np[j::p] & mask).astype(np.uint32)
        packed[: len(ent)] |= ent << np.uint32(bits * j)
    g = (idx >> int(p).bit_length() - 1).astype(jnp.int32)  # idx // p
    # initialize with a cheap BASE and only select the words that differ:
    #   modal constant — long constant runs (the exp table's
    #     underflow-to-zero tail) drop out of the chain entirely;
    #   identity (table[i] == i - 128, int8 tables) — gelu/silu/relu-ish
    #     tables are EXACTLY x over their whole saturated positive tail,
    #     which a constant can never match; the base word is reconstructed
    #     arithmetically from the group index (a handful of VPU ops) and
    #     every tail word drops out of the chain.
    # Bit-identical either way: only matching words are skipped.
    vals, counts = np.unique(packed, return_counts=True)
    mode = int(vals[np.argmax(counts)])
    n_mode = int(counts.max())
    if p == 4 and signed:
        ident = np.arange(n, dtype=np.int64) - 128
        ident_packed = np.zeros(npk, np.uint32)
        for j in range(p):
            ent = (ident[j::p] & mask).astype(np.uint32)
            ident_packed[: len(ent)] |= ent << np.uint32(bits * j)
        n_ident = int((packed == ident_packed).sum())
    else:
        n_ident = -1
    if n_ident > n_mode:
        base = ident_packed
        b0 = (g * jnp.int32(4) - jnp.int32(128)).astype(jnp.uint32)
        w = ((b0 & jnp.uint32(0xFF))
             | ((b0 + jnp.uint32(1)) & jnp.uint32(0xFF)) << jnp.uint32(8)
             | ((b0 + jnp.uint32(2)) & jnp.uint32(0xFF)) << jnp.uint32(16)
             | ((b0 + jnp.uint32(3)) & jnp.uint32(0xFF)) << jnp.uint32(24))
    else:
        base = np.full(npk, np.uint32(mode))
        w = jnp.full(idx.shape, np.uint32(mode), jnp.uint32)
    # words differing from the base, grouped into maximal constant runs:
    # a run of >= 3 equal words (e.g. the zero tail under the identity
    # base) collapses to ONE range test instead of per-word selects
    diff = [k for k in range(npk) if int(packed[k]) != int(base[k])]
    runs: list[tuple[int, int, int]] = []
    for k in diff:
        if runs and runs[-1][1] == k - 1 and runs[-1][2] == int(packed[k]):
            runs[-1] = (runs[-1][0], k, runs[-1][2])
        else:
            runs.append((k, k, int(packed[k])))
    for k0, k1, val in runs:
        if k0 == k1:
            cond = g == jnp.int32(k0)
        elif k1 - k0 >= 2:
            cond = (g >= jnp.int32(k0)) & (g <= jnp.int32(k1))
        else:
            w = jnp.where(g == jnp.int32(k0), jnp.uint32(val), w)
            cond = g == jnp.int32(k1)
        w = jnp.where(cond, jnp.uint32(val), w)
    sh = ((idx & jnp.int32(p - 1)) * jnp.int32(bits)).astype(jnp.uint32)
    b = ((w >> sh) & jnp.uint32(mask)).astype(jnp.int32)
    if not signed:
        return b
    half = jnp.int32(1 << (bits - 1))
    return (b ^ half) - half  # sign-extend the packed lane


def _div_exact_f32(num, den):
    """floor(num / den) for int32 num >= 0, den >= 1 — an f32 reciprocal
    MULTIPLY plus one integer fixup round.

    XLA's int32 vector division dominates the integer softmax on TPU
    (measured: 52 of 63 us at the BERT scores shape); f32 divides are also
    multi-cycle, so the reciprocal is taken once per row and applied as a
    multiply.

    Exactness guarantee (the one callers must actually satisfy): the
    result is bit-identical to `num // den` whenever
      (a) the TRUE quotient Q = num // den satisfies Q < 2^20, and
      (b) num and (Q+1)*den fit in int32 (so the remainder fixup is exact).
    Proof sketch: rounding num and 1/den to f32 and the product each carry
    relative error <= 2^-24, so the candidate c = num_f32 * rcp has
    |c - num/den| <= ~3*2^-24 * Q < 1 for Q < 2^20; hence
    floor(c) is within +/-1 of Q, and the int32 remainder round corrects
    both directions.  num itself MAY exceed 2^24 (its f32 rounding error is
    covered by the relative-error budget) — qnn.softmax reaches
    num <= len*2^15 + 2^23 for long axes but its quotient is <= 321, well
    inside the bound."""
    rcp = jnp.float32(1.0) / den.astype(jnp.float32)
    q = jnp.floor(num.astype(jnp.float32) * rcp).astype(jnp.int32)
    r = num - q * den
    q = jnp.where(r < 0, q - 1, q)
    r = jnp.where(r < 0, r + den, r)
    return jnp.where(r >= den, q + 1, q)


@functools.lru_cache(maxsize=None)
def _lut_poly_plan(table_bytes: bytes):
    """Fit an exhaustively-verified polynomial realization of an int8->int8
    table: constant lead tail + (identity | constant) high tail + a
    degree-9 Chebyshev fit of the curved core in the NORMALIZED domain
    (a raw-index Horner is f32-catastrophic: x^9 at x=255), with fixup
    selects for every core point that rounds wrong OR lands within 0.02 of
    a rounding boundary (so <=1-ulp backend FMA differences can never flip
    a value; measured CPU-vs-TPU Horner deviation is ~8e-6).

    Returns (coefs_f32, sc, off, lo_end, c_lo, hi_start, hi_ident, c_hi,
    fixups) or None when the table has no poly-friendly shape (falls back
    to the packed select chain)."""
    t64 = np.frombuffer(table_bytes, np.int8).astype(np.int64)
    if t64.shape[0] != 256:
        return None
    qv = np.arange(-128, 128)
    lo_end = 1
    while lo_end < 256 and t64[lo_end] == t64[0]:
        lo_end += 1
    hi_id = 256
    while hi_id > 0 and t64[hi_id - 1] == qv[hi_id - 1]:
        hi_id -= 1
    hi_ct = 256
    while hi_ct > 1 and t64[hi_ct - 1] == t64[255]:
        hi_ct -= 1
    hi_ident = (256 - hi_id) >= (256 - hi_ct)
    hi_start = hi_id if hi_ident else hi_ct
    core = np.arange(min(lo_end, hi_start), hi_start)
    if len(core) < 2 or len(core) > 240:
        # no saturated structure to exploit — the packed chain wins
        return None
    a0, a1 = float(core[0]), float(core[-1])
    if a1 == a0:
        return None
    xn = (2 * core - (a0 + a1)) / (a1 - a0)
    cheb = np.polynomial.chebyshev.Chebyshev.fit(
        xn, t64[core].astype(np.float64), deg=min(9, len(core) - 1),
        domain=[-1, 1])
    coefs = np.array(np.polynomial.chebyshev.cheb2poly(cheb.coef),
                     np.float32)
    sc = np.float32(2.0 / (a1 - a0))
    off = np.float32((a0 + a1) / (a1 - a0))
    # exhaustive verification in f32 with the same Horner order
    t = core.astype(np.float32) * sc - off
    acc = np.full(core.shape, coefs[-1], np.float32)
    for c in coefs[:-1][::-1]:
        acc = acc * t + c
    rc = np.rint(acc).astype(np.int64)
    frac = np.abs(acc.astype(np.float64) - np.floor(acc) - 0.5)
    fixups = tuple((int(k), int(t64[k])) for k in
                   core[(rc != t64[core]) | (frac < 0.02)])
    if len(fixups) > 16:
        return None  # fit too poor to beat the packed chain
    return (tuple(float(c) for c in coefs), float(sc), float(off),
            int(lo_end), int(t64[0]), int(hi_start), bool(hi_ident),
            int(t64[255]), fixups)


def _lut_poly_eval(plan, x_int8):
    """Evaluate a `_lut_poly_plan` on int8 inputs (shared by the fast path
    and the on-device self-check below)."""
    (coefs, sc, off, lo_end, c_lo, hi_start, hi_ident, c_hi, fixups) = plan
    xi = x_int8.astype(jnp.int32)
    idx = xi + jnp.int32(128)
    t = idx.astype(jnp.float32) * jnp.float32(sc) - jnp.float32(off)
    acc = jnp.float32(coefs[-1])
    for c in coefs[-2::-1]:
        acc = acc * t + jnp.float32(c)
    v = jnp.round(acc).astype(jnp.int32)
    if hi_ident:
        v = jnp.where(idx >= jnp.int32(hi_start), xi, v)
    else:
        v = jnp.where(idx >= jnp.int32(hi_start), jnp.int32(c_hi), v)
    v = jnp.where(idx < jnp.int32(lo_end), jnp.int32(c_lo), v)
    for k, val in fixups:
        v = jnp.where(idx == jnp.int32(k), jnp.int32(val), v)
    return jnp.clip(v, -128, 127).astype(jnp.int8)


_POLY_PLAN_BACKEND_OK: dict = {}


def _poly_plan_backend_check(table_bytes: bytes, plan) -> bool:
    """One-time per-(table, backend) 256-point self-check, run on the
    ACTUAL backend at trace time.  The plan's bit-exactness rests on an
    empirical rounding-boundary margin (0.02 vs the ~8e-6 cross-backend
    Horner/FMA deviation measured on CPU and v5e); a backend whose FMA
    deviates beyond that margin must fall back to the packed select chain
    rather than silently break the == contract.  Memoized; costs one tiny
    256-element compile per distinct table."""
    import jax

    key = (table_bytes, jax.default_backend())
    ok = _POLY_PLAN_BACKEND_OK.get(key)
    if ok is None:
        t64 = np.frombuffer(table_bytes, np.int8)
        xs = np.arange(-128, 128, dtype=np.int8)
        # the check may run while TRACING a caller's jit: escape the trace
        # so the 256-point probe executes eagerly on the real backend
        with jax.ensure_compile_time_eval():
            got = np.asarray(jax.jit(
                lambda v: _lut_poly_eval(plan, v))(jnp.asarray(xs)))
        ok = bool(np.array_equal(got, t64))
        _POLY_PLAN_BACKEND_OK[key] = ok
    return ok


def _lut_apply_int8(table_np: np.ndarray, x_int8):
    """int8 -> int8 table application: polynomial-hybrid when the table has
    saturated tails and a smooth core (gelu/silu/sigmoid/tanh — ~2x faster
    than the packed select chain on v5e, bit-identical by exhaustive
    256-point verification at plan time AND re-verified once on the live
    backend), else the packed select chain."""
    table_np = np.asarray(table_np, np.int8)
    plan = _lut_poly_plan(table_np.tobytes()) if table_np.shape[0] == 256 \
        else None
    if plan is not None and not _poly_plan_backend_check(
            table_np.tobytes(), plan):
        plan = None
    xi = x_int8.astype(jnp.int32)
    idx = xi + jnp.int32(128)
    if plan is None:
        return _lut_select(table_np, idx).astype(jnp.int8)
    return _lut_poly_eval(plan, x_int8)


def _exp_q15(scale: float, d):
    """Factorized Q15 exp lookup — bit-identical to indexing
    qnn.softmax_exp_table(scale)[d] (the table IS defined by these factors,
    ops/qnn.py softmax_exp_factors): two 16-entry packed selects + one Q15
    multiply instead of a 128-word select chain."""
    from .qnn import LUT_EXP_BITS, LUT_SIZE, softmax_exp_factors

    hi, lo = softmax_exp_factors(scale)
    h = _lut_select(hi, d >> 4)
    l = _lut_select(lo, d & jnp.int32(15))
    p = (h * l + jnp.int32(1 << (LUT_EXP_BITS - 1))) >> LUT_EXP_BITS
    return jnp.where(d == jnp.int32(LUT_SIZE - 1), jnp.int32(0), p)


@jax_impl("qnn.softmax")
def _qsoftmax_jax(x, *, node: Node):
    # All-int32 realization (identical values: p <= 2^15, so p*256 and the
    # row sums stay within int32 for seq <= 65536) — int64 is emulated and
    # slow on TPU, and gathers are replaced by a one-hot MXU matmul.
    from .qnn import LUT_SIZE, SOFTMAX_OUT_ZP

    axis = int(node.attrs.get("axis", -1))
    v = x.astype(jnp.int32)
    m = v.max(axis=axis, keepdims=True)
    d = jnp.clip(m - v, 0, LUT_SIZE - 1)
    p = _exp_q15(float(node.attrs["input_scale"]), d)
    ssum = p.sum(axis=axis, keepdims=True, dtype=jnp.int32)
    # exact f32-reciprocal division: XLA's int32 vector divide was 82% of
    # this op's time on v5e (bounds: num <= 2^23 + 2^21, den <= 2^22)
    q = _div_exact_f32(p * jnp.int32(256) + ssum // jnp.int32(2), ssum)
    out = jnp.clip(q + jnp.int32(SOFTMAX_OUT_ZP), jnp.int32(-128), jnp.int32(127))
    return out.astype(_jdt(node.attrs.get("out_dtype", "int8")))


@jax_impl("qnn.lut")
def _qlut_jax(x, *, node: Node):
    table = np.asarray(node.attrs["table"], dtype=np.int8)
    return _lut_apply_int8(table, x)


@jax_impl("qnn.attention")
def _qattn_jax(q, k, v, *, node: Node):
    from .qnn import LUT_SIZE

    scores_scale = float(node.attrs["scores_scale"])
    out_scale = float(node.attrs["output_scale"])
    v_scale = float(node.attrs["v_scale"])
    s = jnp.matmul(q.astype(jnp.int32), jnp.swapaxes(k.astype(jnp.int32), -1, -2),
                   preferred_element_type=jnp.int32)
    m = s.max(axis=-1, keepdims=True)
    d = jnp.clip(m - s, 0, LUT_SIZE - 1)
    p = _exp_q15(scores_scale, d)
    ssum = p.sum(axis=-1, keepdims=True, dtype=jnp.int32)
    u = _div_exact_f32(p * jnp.int32(256) + ssum // jnp.int32(2), ssum)
    ctx = jnp.matmul(u, v.astype(jnp.int32), preferred_element_type=jnp.int32)
    return requantize_jnp(
        ctx, v_scale / 256.0, 0, out_scale, 0,
        rounding=node.attrs.get("rounding", "UPWARD"),
        out_dtype=node.attrs.get("out_dtype", "int8"),
    )


@jax_impl("qnn.layer_norm")
def _qln_jax(x, *, node: Node):
    """Bit-identical realization of ops/qnn.py qnn.layer_norm (int32 + one
    IEEE int->f32 conversion; the fixed-point multiply runs on the u32
    emulation so no int64 is needed on TPU)."""
    from .pallas.qms32 import q_multiply_shift_u32
    from .qnn import _LN_RSQRT_TABLE

    a = node.attrs
    k1, k2 = int(a["k1"]), int(a["k2"])
    n = x.shape[-1]

    def rsh(v, k):
        if k <= 0:
            return v
        return (v + jnp.int32(1 << (k - 1))) >> jnp.int32(k)

    t = x.astype(jnp.int32) - jnp.int32(a.get("input_zero_point", 0))
    s = t.sum(axis=-1, keepdims=True, dtype=jnp.int32)
    c = jnp.int32(n) * t - s
    d = rsh(c, k1)
    v = jnp.maximum((d * d).sum(axis=-1, keepdims=True, dtype=jnp.int32),
                    jnp.int32(1))
    fb = v.astype(jnp.float32)                     # IEEE RNE int->f32
    bits = lax.bitcast_convert_type(fb, jnp.int32)  # v>0 => sign bit 0
    e = bits >> jnp.int32(23)
    mant8 = (bits >> jnp.int32(15)) & jnp.int32(0xFF)
    frac = (bits >> jnp.int32(7)) & jnp.int32(0xFF)
    odd = (e - jnp.int32(127)) & jnp.int32(1)
    e2 = (e - jnp.int32(127)) >> jnp.int32(1)
    idx = odd * jnp.int32(256) + mant8
    table = jnp.asarray(_LN_RSQRT_TABLE, jnp.int32)
    t0 = jnp.take(table, idx, axis=0)
    t1 = jnp.take(table, idx + jnp.int32(1), axis=0)
    r = t0 - (((t0 - t1) * frac) >> jnp.int32(8))  # Q15
    y = rsh(c, k2) * r
    sign = jnp.asarray(np.asarray(a["sign"], np.int32))
    y = y * sign
    m_ch = jnp.asarray(np.asarray(a["multiplier"], np.int32))
    s_ch = jnp.asarray(np.asarray(a["shift"], np.int32))
    sh = s_ch - e2                                 # rows x channels
    out = q_multiply_shift_u32(y, m_ch, sh, "UPWARD")
    out = out + jnp.asarray(np.asarray(a["bias"], np.int32))
    odt = a.get("out_dtype", "int8")
    return jnp.clip(out, jnp.int32(dt.qmin(odt)), jnp.int32(dt.qmax(odt))).astype(_jdt(odt))


@jax_impl("qnn.simulated_quantize")
def _simq_jax(x, *, node: Node):
    from .qnn import _sim_scale_zp
    from ..utils import dtypes as dt

    scale, zp = _sim_scale_zp(node, x.ndim)
    odt = node.attrs.get("out_dtype", "int8")
    lo, hi = dt.qmin(odt), dt.qmax(odt)
    x = x.astype(jnp.float32)
    q = jnp.round(x / scale) + zp
    qc = jnp.clip(q, lo, hi)
    # straight-through estimator: gradient 1/scale inside the representable
    # range, 0 where the clip saturates (the QAT-standard fake-quant grad)
    inside = (q >= lo) & (q <= hi)
    ste = x / scale + jax.lax.stop_gradient(qc - x / scale)
    return jnp.where(inside, ste, jax.lax.stop_gradient(qc))


@jax_impl("qnn.simulated_dequantize")
def _simdq_jax(x, *, node: Node):
    from .qnn import _sim_scale_zp

    scale, zp = _sim_scale_zp(node, x.ndim)
    return (x.astype(jnp.float32) - zp) * scale
