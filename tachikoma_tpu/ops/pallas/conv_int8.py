"""Pallas int8 conv2d with fused requantize epilogue (direct, NHWC).

The MXU realization of qnn.conv2d (SURVEY.md §7.3 'MXU speed-of-light int8
conv'): the K x K convolution decomposes into K^2 shifted matmuls
    acc[oh*ow, co] += X[oh*s+ki, ow*s+kj, :] @ W[ki, kj, :, :]
each an (OH*OW, CIN_blk) x (CIN_blk, COUT_blk) int8 MXU matmul accumulated in
a VMEM int32 scratch; the exact fixed-point requantize epilogue runs before
the single int8 store, so accumulators never touch HBM.

Grid: (batch, cout_blocks, cin_blocks) — cin is the reduction ('arbitrary')
axis.  The whole (padded) image lives in VMEM per grid cell, which covers
ResNet/MobileNet body layers (<= ~112x112 at 128ch); callers fall back to
the XLA path when the image block exceeds the VMEM budget
(`qconv2d_supported`).

Depthwise convolution (MobileNet) gets a VPU variant: per-channel K^2
multiply-accumulate without the MXU.
"""

from __future__ import annotations

import functools

import numpy as np

from .matmul_int8 import _interpret_default, _round_up

# VMEM budget for the input image block (bytes); one v5e core has ~16 MiB.
_VMEM_IMAGE_BUDGET = 10 * 1024 * 1024


def _strided_patch(v, ki, kj, oh, ow, sh, sw, c):
    """(oh, ow, c) window at offset (ki, kj) with stride (sh, sw).

    Mosaic only supports unit-stride vector slices; strided windows are
    realized as a contiguous slice + reshape(oh, sh, ow, sw, c) + unit
    index.  The caller pads the image block so ki + sh*oh <= Hp."""
    from jax import lax

    if sh == 1 and sw == 1:
        return lax.slice(v, (ki, kj, 0), (ki + oh, kj + ow, c))
    region = lax.slice(v, (ki, kj, 0), (ki + sh * oh, kj + sw * ow, c))
    r = region.reshape(oh, sh, ow, sw, c)
    return r[:, 0, :, 0, :]


def _conv_kernel(x_ref, w_ref, bias_ref, m_ref, s_ref, o_ref, acc_ref, *,
                 kh: int, kw: int, stride: tuple, oh: int, ow: int,
                 n_cin: int, out_zp: int, rounding: str,
                 qmin: int, qmax: int, shift_values: tuple):
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    from .qms32 import q_multiply_shift_select

    sh, sw = stride

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    v = x_ref[0]  # (Hp, Wp, bkc) int8
    bkc = v.shape[-1]
    # im2col in VMEM: concatenate the kh*kw shifted windows along the
    # reduction axis and run ONE (oh*ow, kh*kw*bkc) matmul — a far better
    # MXU shape than kh*kw thin K=bkc matmuls
    cols = [
        _strided_patch(v, ki, kj, oh, ow, sh, sw, bkc).reshape(oh * ow, bkc)
        for ki in range(kh)
        for kj in range(kw)
    ]
    patch = jnp.concatenate(cols, axis=-1) if len(cols) > 1 else cols[0]
    wmat = w_ref[...].reshape(kh * kw * bkc, w_ref.shape[-1])
    acc_ref[...] += jnp.dot(patch, wmat, preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == n_cin - 1)
    def _epilogue():
        a = acc_ref[...] + bias_ref[...]
        r = q_multiply_shift_select(a, m_ref[...], s_ref[...], shift_values, rounding)
        if out_zp:
            r = r + jnp.int32(out_zp)
        r = jnp.clip(r, jnp.int32(qmin), jnp.int32(qmax))
        o_ref[0] = r.reshape(oh, ow, r.shape[-1]).astype(o_ref.dtype)


def _dw_kernel(x_ref, w_ref, bias_ref, m_ref, s_ref, o_ref, *,
               kh: int, kw: int, stride: tuple, oh: int, ow: int,
               out_zp: int, rounding: str, qmin: int, qmax: int,
               shift_values: tuple):
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    from .qms32 import q_multiply_shift_select

    sh, sw = stride
    v = x_ref[0]  # (Hp, Wp, bc) int8 — upcast per patch to bound VMEM peaks
    bc = v.shape[-1]
    acc = jnp.zeros((oh, ow, bc), jnp.int32)
    for ki in range(kh):
        for kj in range(kw):
            patch = _strided_patch(v, ki, kj, oh, ow, sh, sw, bc).astype(jnp.int32)
            acc = acc + patch * w_ref[ki, kj][None, None, :].astype(jnp.int32)
    a = acc + bias_ref[...][None]  # (1,bc) -> (1,1,bc)
    r = q_multiply_shift_select(a, m_ref[...][None], s_ref[...][None], shift_values, rounding)
    if out_zp:
        r = r + jnp.int32(out_zp)
    o_ref[0] = jnp.clip(r, jnp.int32(qmin), jnp.int32(qmax)).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_qconv(n, hp, wp, cin, cout, kh, kw, stride, oh, ow, bn, bkc,
                 out_zp, rounding, qmin, qmax, out_dtype, shift_values,
                 interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_cin = cin // bkc
    grid = (n, cout // bn, n_cin)
    kernel = functools.partial(
        _conv_kernel, kh=kh, kw=kw, stride=stride, oh=oh, ow=ow,
        n_cin=n_cin, out_zp=out_zp, rounding=rounding,
        qmin=qmin, qmax=qmax, shift_values=shift_values,
    )
    kw_extra = {}
    if not interpret:
        kw_extra["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        )
        kw_extra["cost_estimate"] = pl.CostEstimate(
            flops=2 * n * oh * ow * cout * kh * kw * cin,
            bytes_accessed=n * hp * wp * cin + kh * kw * cin * cout + n * oh * ow * cout,
            transcendentals=0,
        )
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, cout), jnp.dtype(out_dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, hp, wp, bkc), lambda b, j, k: (b, 0, 0, k)),
                pl.BlockSpec((kh, kw, bkc, bn), lambda b, j, k: (0, 0, k, j)),
                pl.BlockSpec((1, bn), lambda b, j, k: (0, j)),
                pl.BlockSpec((1, bn), lambda b, j, k: (0, j)),
                pl.BlockSpec((1, bn), lambda b, j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, oh, ow, bn), lambda b, j, k: (b, 0, 0, j)),
            scratch_shapes=[pltpu.VMEM((oh * ow, bn), jnp.int32)],
        ),
        interpret=interpret,
        **kw_extra,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _build_qconv_dw(n, hp, wp, c, kh, kw, stride, oh, ow, bc,
                    out_zp, rounding, qmin, qmax, out_dtype, shift_values,
                    interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n, c // bc)
    kernel = functools.partial(
        _dw_kernel, kh=kh, kw=kw, stride=stride, oh=oh, ow=ow,
        out_zp=out_zp, rounding=rounding, qmin=qmin, qmax=qmax,
        shift_values=shift_values,
    )
    kw_extra = {}
    if not interpret:
        kw_extra["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        )
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), jnp.dtype(out_dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, hp, wp, bc), lambda b, j: (b, 0, 0, j)),
                pl.BlockSpec((kh, kw, bc), lambda b, j: (0, 0, j)),
                pl.BlockSpec((1, bc), lambda b, j: (0, j)),
                pl.BlockSpec((1, bc), lambda b, j: (0, j)),
                pl.BlockSpec((1, bc), lambda b, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, oh, ow, bc), lambda b, j: (b, 0, 0, j)),
        ),
        interpret=interpret,
        **kw_extra,
    )
    return jax.jit(fn)


def _vmem_cost(hp, wpad, bkc, oh, ow, bn, kh, kw) -> int:
    """Approximate VMEM bytes: double-buffered input/weight blocks + int32
    accumulator scratch + output block."""
    x_b = hp * wpad * bkc          # int8
    w_b = kh * kw * bkc * bn       # int8
    acc = oh * ow * bn * 4         # int32 scratch
    out = oh * ow * bn             # int8
    return 2 * x_b + 2 * w_b + acc + 2 * out


def _pick_bn(hp, wpad, bkc, oh, ow, cout, kh, kw) -> int | None:
    for bn in (256, 128):
        if bn > _round_up(cout, 128):
            continue
        if _vmem_cost(hp, wpad, bkc, oh, ow, bn, kh, kw) <= _VMEM_IMAGE_BUDGET:
            return bn
    bn = 128
    if _vmem_cost(hp, wpad, bkc, oh, ow, bn, kh, kw) <= _VMEM_IMAGE_BUDGET:
        return bn
    return None


def qconv2d_supported(x_shape, w_shape, strides, padding, groups: int) -> bool:
    n, h, w, cin = x_shape
    kh, kw, wcin, cout = w_shape
    pt, pl_, pb, pr = padding
    sh, sw = strides
    hp, wpad = h + pt + pb, w + pl_ + pr
    oh = (hp - kh) // sh + 1
    ow = (wpad - kw) // sw + 1
    if groups == 1:
        bkc = min(_round_up(cin, 128), 512)  # int8 lane dim: 128-aligned
        return _pick_bn(hp, wpad, bkc, oh, ow, cout, kh, kw) is not None
    if groups == cin and wcin == 1:  # depthwise
        # stride > 1 needs the reshape-subsample trick whose relayout
        # transients exceed the 16MB scoped-VMEM limit at MobileNet sizes
        # (measured on v5e); those layers take the XLA path
        if (sh, sw) != (1, 1):
            return False
        return _pick_dw_bc(hp, wpad, oh, ow, cin) is not None
    return False


def _pick_dw_bc(hp, wpad, oh, ow, c) -> int | None:
    # Mosaic: the last block dim must be a multiple of 128 (or the whole,
    # padded, array dim) — channel blocks are always 128 here.
    bc = 128
    if (hp * wpad * bc * 4 + oh * ow * bc * 5) * 2 <= _VMEM_IMAGE_BUDGET:
        return bc
    return None


def qconv2d_int8(
    x, w, bias=None, multiplier=None, shift=None, *,
    strides=(1, 1), padding=(0, 0, 0, 0), groups: int = 1,
    input_zero_point: int = 0,
    out_zp: int = 0, rounding: str = "UPWARD", out_dtype: str = "int8",
    qmin: int = -128, qmax: int = 127,
):
    """NHWC int8 conv with fused exact requantize.

    x (N,H,W,CIN) int8; w (KH,KW,CIN/groups,COUT) int8; groups == 1 or
    depthwise (groups == CIN).  A nonzero input_zero_point folds into the
    bias via the weight column sums (exact, mod-2^32)."""
    import jax.numpy as jnp

    n, h, wd, cin = x.shape
    kh, kw, wcin, cout = w.shape
    sh, sw = strides
    pt, pl_, pb, pr = padding
    oh = (h + pt + pb - kh) // sh + 1
    ow = (wd + pl_ + pr - kw) // sw + 1

    bias_arr = jnp.zeros((cout,), jnp.int32) if bias is None else jnp.asarray(bias, jnp.int32)
    if input_zero_point:
        # acc(x - izp, w) = x.w - izp * colsum(w): fold into bias
        colsum = jnp.sum(jnp.asarray(w, jnp.int32), axis=(0, 1, 2) if groups == 1 else (0, 1))
        if groups != 1:
            colsum = colsum.reshape(-1)
        bias_arr = bias_arr - jnp.int32(input_zero_point) * colsum

    m_arr = jnp.broadcast_to(jnp.asarray(multiplier, jnp.int32), (cout,))
    s_arr = jnp.broadcast_to(jnp.asarray(shift, jnp.int32), (cout,))
    shift_values = tuple(sorted({int(v) for v in np.atleast_1d(np.asarray(shift))}))

    # spatial pad (zero); with izp folded above, zero-padding is exact
    # because conv pads with izp-equivalent zeros AFTER the zp shift
    interp = _interpret_default()

    if groups == 1:
        bkc = min(_round_up(cin, 128), 512)  # int8 lane dim: 128-aligned
        hp0 = h + pt + pb
        wp0 = wd + pl_ + pr
        bn = _pick_bn(hp0, wp0, bkc, oh, ow, cout, kh, kw)
        if bn is None:
            raise ValueError("conv image block exceeds VMEM budget; use the XLA path")
        cin_p = _round_up(cin, bkc)
        cout_p = _round_up(cout, bn)
        # strided windows need ki + sh*oh rows available (see _strided_patch)
        hp_req = (kh - 1) + sh * oh
        wp_req = (kw - 1) + sw * ow
        extra_b = max(0, hp_req - (h + pt + pb))
        extra_r = max(0, wp_req - (wd + pl_ + pr))
        xp = jnp.pad(
            x, ((0, 0), (pt, pb + extra_b), (pl_, pr + extra_r), (0, 0)),
            constant_values=np.int8(input_zero_point),
        )
        if cin_p != cin:
            xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, cin_p - cin)))
        wp_ = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - cin), (0, cout_p - cout)))
        pad1 = lambda a, cv=0: jnp.pad(a, (0, cout_p - cout), constant_values=cv).reshape(1, cout_p)
        hp, wpad = xp.shape[1], xp.shape[2]
        fn = _build_qconv(
            n, hp, wpad, cin_p, cout_p, kh, kw, (sh, sw), oh, ow, bn, bkc,
            int(out_zp), rounding, qmin, qmax, out_dtype, shift_values, interp,
        )
        from .matmul_int8 import _x32_tracing

        with _x32_tracing():
            out = fn(xp, wp_, pad1(bias_arr), pad1(m_arr, 1), pad1(s_arr))
        return out[..., :cout] if cout_p != cout else out
    elif groups == cin and wcin == 1:
        hp0, wp0 = h + pt + pb, wd + pl_ + pr
        bc = _pick_dw_bc(hp0, wp0, oh, ow, cin)
        if bc is None:
            raise ValueError("depthwise image block exceeds VMEM budget")
        c_p = _round_up(cin, bc)
        hp_req = (kh - 1) + sh * oh
        wp_req = (kw - 1) + sw * ow
        extra_b = max(0, hp_req - (h + pt + pb))
        extra_r = max(0, wp_req - (wd + pl_ + pr))
        xp = jnp.pad(
            x, ((0, 0), (pt, pb + extra_b), (pl_, pr + extra_r), (0, 0)),
            constant_values=np.int8(input_zero_point),
        )
        if c_p != cin:
            xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, c_p - cin)))
        wdw = jnp.pad(jnp.asarray(w).reshape(kh, kw, cout), ((0, 0), (0, 0), (0, c_p - cout)))
        padv = lambda a, cv=0: jnp.pad(a, (0, c_p - cout), constant_values=cv).reshape(1, c_p)
        hp, wpad = xp.shape[1], xp.shape[2]
        fn = _build_qconv_dw(
            n, hp, wpad, c_p, kh, kw, (sh, sw), oh, ow, bc,
            int(out_zp), rounding, qmin, qmax, out_dtype, shift_values, interp,
        )
        from .matmul_int8 import _x32_tracing

        with _x32_tracing():
            out = fn(xp, wdw, padv(bias_arr), padv(m_arr, 1), padv(s_arr))
        return out[..., :cout] if c_p != cout else out
    else:
        raise NotImplementedError("pallas conv supports groups==1 or depthwise")
