"""Flattened-HW Pallas int8 conv2d: MXU spatial tiling with zero relayout.

Round-2 rearchitecture of the direct conv (the round-1 kernel held one whole
image per grid cell and built an im2col patch matrix with lane-dimension
concatenates — 1.2% of the MXU roofline).  This kernel instead plays the role
of the reference's tuned int8 conv schedules
(`/root/reference/python/tvm/topi/cuda/conv2d_int8.py:31` conv2d_NCHWc_int8,
`/root/reference/python/tvm/topi/x86/conv2d_int8.py:136` VNNI NCHWc) with a
TPU-native design:

*Flat trick.*  Pad the image to (Hp, Wp), flatten space to rows of a
(N*Hp*Wp, C) matrix, and compute the conv "over-wide": output row
m = n*FH + oh*Wp + ow for ALL ow in [0, Wp) (the last kw-1 columns of each
row are garbage, sliced off afterwards).  Then the input patch for kernel
tap (ki, kj) is the UNIT-STRIDE row slice  xflat[m + ki*Wp + kj]  — no
reshape, no concatenate, no strided window.  Each tap is one dense
(bm, C) x (C, bn) int8 MXU matmul accumulated into a VMEM int32 scratch,
with the exact fixed-point requantize epilogue fused before the single int8
store.  Spatial over-compute is (Hp*Wp)/(OH*OW) ≈ 7% for 56x56 k3.

*Strides via polyphase decomposition.*  A stride-(sh,sw) conv is rewritten
as a stride-1 conv over phase-subsampled images stacked on the channel dim:
    out = conv_s1( stack_{p,q} x[p::sh, q::sw],  W'[a,b,(p,q,c),o] )
with W'[a,b,(p,q,c),o] = W[a*sh+p, b*sw+q, c, o] (zero where out of range).
The kernel itself is stride-1-only; phase extraction is one XLA
reshape/transpose of the input.

*Grid.*  (M/bm, COUT/bn, CIN'/bk) with the flat image resident in VMEM as a
single non-M-blocked block (Pallas does not re-DMA a block whose index map
is unchanged across grid steps); the kernel slices it at
pl.ds(program_id(0)*bm + tap_offset, bm).  The K axis is the reduction
("arbitrary") dimension.

Depthwise convolution uses the same flat layout on the VPU: per-channel
multiply-accumulate over taps with an in-kernel M-chunk loop (no MXU), with
per-phase tap lists so polyphase stride-2 wastes zero MACs.

1x1 convs are routed to the tuned Pallas matmul (`matmul_int8.qmatmul_int8`)
— a 1x1 conv IS a GEMM; stride-2 1x1 subsamples the input first (exact).

*Frame chains* (bottom of this file).  Runs of stride-1, spatial-preserving
convs exchange "frames": the raw over-wide kernel output with every garbage
cell masked to the stage's zero point, shifted one block down so the lead
margin doubles as top padding.  Inner stages run at raw kernel speed with
zero relayout — the TPU form of the reference's AlterOpLayout + NCHWc conv
discipline.  fuse.py's fuse_conv_chains rewrites eligible graph regions to
use qconv2d_flat_chain; e2e A/B on ResNet-50 b8: 4.4 ms chained vs 5.05 ms
sequential.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from .matmul_int8 import _cdiv, _interpret_default, _round_up, _x32_tracing

# conservative per-core VMEM budget for kernel working sets (bytes)
_VMEM_BUDGET = 12 * 1024 * 1024


# ---------------------------------------------------------------------------
# MXU kernel (groups == 1)
# ---------------------------------------------------------------------------

def _flat_conv_kernel(x_ref, w_ref, bias_ref, m_ref, s_ref, o_ref, acc_ref, *,
                      taps: tuple, wph: int, bm: int, pad: int, n_k: int,
                      fuse: bool, out_zp: int, rounding: str, qmin: int,
                      qmax: int, shift_values: tuple,
                      rq_mode: str | None = None):
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    from .qms32 import fused_requantize, q_multiply_shift_select

    # one ALIGNED dynamic load covering every tap's window (Mosaic requires
    # sublane-aligned dynamic offsets).  int8 is (4,1)-packed in VMEM, so a
    # row shift by r in {1,2,3} is an expensive byte shuffle: extract at most
    # 4 byte-phase windows (one per off%4 residue — wph is padded to a
    # multiple of 4 so row taps stay pack-aligned) and give every tap a
    # 4-aligned static slice of its phase window.
    m0 = pl.multiple_of(pl.program_id(0) * bm, bm)
    win = x_ref[pl.ds(m0, bm + pad), :]
    bkc = win.shape[-1]
    wlen = bm + pad - 4
    wins = {}
    for r in sorted({(a * wph + b) % 4 for (a, b) in taps}):
        wins[r] = lax.slice(win, (r, 0), (r + wlen, bkc))
    # accumulate the tap dots as SSA values (vregs), not via per-tap
    # read-modify-writes of the 256 KB int32 VMEM scratch — the scratch
    # round-trips (2 x bm x bn x 4 bytes x taps per cell) dominate at
    # narrow COUT, where the kernel is VMEM-bandwidth-bound, not MXU-bound
    part = None
    for (a, b) in taps:
        off = a * wph + b
        r = off % 4
        patch = lax.slice(wins[r], (off - r, 0), (off - r + bm, bkc))
        d = jnp.dot(patch, w_ref[a, b], preferred_element_type=jnp.int32)
        part = d if part is None else part + d

    def _finish(acc):
        acc = acc + bias_ref[...]
        if fuse:
            v = fused_requantize(acc, m_ref[...], s_ref[...], shift_values,
                                 rounding, out_zp, qmin, qmax, rq_mode)
            o_ref[...] = v.astype(o_ref.dtype)
        else:
            o_ref[...] = acc

    if n_k == 1:
        # single k-block (cin <= bk, e.g. every ResNet stage-2 conv): the
        # accumulator never touches VMEM at all
        _finish(part)
    else:
        @pl.when(pl.program_id(2) == 0)
        def _first():
            acc_ref[...] = part

        @pl.when((pl.program_id(2) > 0) & (pl.program_id(2) < n_k - 1))
        def _mid():
            acc_ref[...] += part

        @pl.when(pl.program_id(2) == n_k - 1)
        def _epilogue():
            _finish(acc_ref[...] + part)




def _flat_conv_kernel_s(x_ref, w_ref, bias_ref, m_ref, s_ref, o_ref, acc_ref,
                        patch_ref, *,
                        taps: tuple, wph: int, bm: int, pad: int, n_k: int,
                        fuse: bool, out_zp: int, rounding: str, qmin: int,
                        qmax: int, shift_values: tuple,
                      rq_mode: str | None = None):
    """Scratch-im2col variant: copy every tap window into a (bm, T*bk) int8
    VMEM patch (lane-block writes at 128-aligned offsets), then ONE deep-K
    MXU dot per k-block.  The MXU accumulates across taps internally, so the
    per-tap int32 accumulator read-modify-writes of the baseline kernel
    (9x (bm, bn) VPU adds) collapse to a single add — the baseline is
    VPU-bound at narrow COUT, not MXU-bound."""
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    from .qms32 import fused_requantize, q_multiply_shift_select

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    m0 = pl.multiple_of(pl.program_id(0) * bm, bm)
    win = x_ref[pl.ds(m0, bm + pad), :]
    bkc = win.shape[-1]
    wlen = bm + pad - 4
    wins = {}
    for r in sorted({(a * wph + b) % 4 for (a, b) in taps}):
        wins[r] = lax.slice(win, (r, 0), (r + wlen, bkc))
    for t, (a, b) in enumerate(taps):
        off = a * wph + b
        r = off % 4
        patch_ref[:, t * bkc:(t + 1) * bkc] = lax.slice(
            wins[r], (off - r, 0), (off - r + bm, bkc))
    wm = w_ref[...].reshape(len(taps) * bkc, w_ref.shape[-1])
    acc_ref[...] += jnp.dot(
        patch_ref[...], wm, preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _epilogue():
        acc = acc_ref[...] + bias_ref[...]
        if fuse:
            v = fused_requantize(acc, m_ref[...], s_ref[...], shift_values,
                                 rounding, out_zp, qmin, qmax, rq_mode)
            o_ref[...] = v.astype(o_ref.dtype)
        else:
            o_ref[...] = acc


def _flat_conv_kernel_w(x_ref, w_ref, bias_ref, m_ref, s_ref, o_ref, acc_ref, *,
                        taps: tuple, wph: int, bm: int, pad: int, n_k: int,
                        fuse: bool, out_zp: int, rounding: str, qmin: int,
                        qmax: int, shift_values: tuple,
                      rq_mode: str | None = None):
    """Wide-N variant: ONE (bm+pad, bk) x (bk, T*bn) dot computes every tap's
    contribution for every row, then taps are combined by SHIFTED int32
    slices (static sublane shifts — native for 32-bit data, unlike the int8
    byte shuffles the baseline pays for row taps).  Trades (pad/bm) extra
    MXU rows + an int32 intermediate for zero input relayout."""
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    from .qms32 import fused_requantize, q_multiply_shift_select

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    m0 = pl.multiple_of(pl.program_id(0) * bm, bm)
    win = x_ref[pl.ds(m0, bm + pad), :]
    bk = win.shape[-1]
    t_n = len(taps)
    bn = w_ref.shape[-1]
    wide = jnp.dot(win, w_ref[...].reshape(bk, t_n * bn),
                   preferred_element_type=jnp.int32)
    for t, (a, b) in enumerate(taps):
        off = a * wph + b
        acc_ref[...] += lax.slice(wide, (off, t * bn), (off + bm, (t + 1) * bn))

    @pl.when(pl.program_id(2) == n_k - 1)
    def _epilogue():
        acc = acc_ref[...] + bias_ref[...]
        if fuse:
            v = fused_requantize(acc, m_ref[...], s_ref[...], shift_values,
                                 rounding, out_zp, qmin, qmax, rq_mode)
            o_ref[...] = v.astype(o_ref.dtype)
        else:
            o_ref[...] = acc


def _flat_conv_kernel_r(x_ref, w_ref, bias_ref, m_ref, s_ref, o_ref, acc_ref, *,
                        taps: tuple, wph: int, bm: int, pad: int, n_k: int,
                        fuse: bool, out_zp: int, rounding: str, qmin: int,
                        qmax: int, shift_values: tuple,
                      rq_mode: str | None = None):
    """Row-stacked-K variant: for each COLUMN tap b, lane-concatenate the khp
    row-tap windows into one (bm, khp*bk) operand and do ONE deep-K dot —
    kwp dots total instead of khp*kwp, so the int32 accumulator
    read-modify-writes drop by khp x.  The concatenate is a vreg lane
    placement (no scratch stores); weights arrive as (kwp, khp, bk, bn).

    Measured on v5e: ~5% ahead of the base kernel at 28x28x256 (95.6 vs
    90.4 TOPS) and even at 14x14x256; Mosaic FAILS to compile it at
    cin=128 (bk=128, 3*128-lane concat) — select it per-shape via the tune
    DB only."""
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    from .qms32 import fused_requantize, q_multiply_shift_select

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    m0 = pl.multiple_of(pl.program_id(0) * bm, bm)
    win = x_ref[pl.ds(m0, bm + pad), :]
    bkc = win.shape[-1]
    wlen = bm + pad - 4
    wins = {}
    for r in sorted({(a * wph + b) % 4 for (a, b) in taps}):
        wins[r] = lax.slice(win, (r, 0), (r + wlen, bkc))
    khp = max(a for (a, _) in taps) + 1
    for b in sorted({b for (_, b) in taps}):
        parts = []
        for a in range(khp):
            off = a * wph + b
            r = off % 4
            parts.append(lax.slice(wins[r], (off - r, 0), (off - r + bm, bkc)))
        patch = jnp.concatenate(parts, axis=1)       # (bm, khp*bk)
        wm = w_ref[b].reshape(khp * bkc, w_ref.shape[-1])
        acc_ref[...] += jnp.dot(patch, wm, preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _epilogue():
        acc = acc_ref[...] + bias_ref[...]
        if fuse:
            v = fused_requantize(acc, m_ref[...], s_ref[...], shift_values,
                                 rounding, out_zp, qmin, qmax, rq_mode)
            o_ref[...] = v.astype(o_ref.dtype)
        else:
            o_ref[...] = acc


def _flat_conv_kernel_t(x_ref, w_ref, bias_ref, m_ref, s_ref, o_ref, acc_ref, *,
                        taps: tuple, wph: int, bm: int, pad: int, n_k: int,
                        fuse: bool, out_zp: int, rounding: str, qmin: int,
                        qmax: int, shift_values: tuple,
                      rq_mode: str | None = None):
    """Transposed-image variant: x_ref is (CIN, FHX) so tap shifts are LANE
    shifts (native vector shuffles; int8 packs along sublanes, so row shifts
    in the untransposed layout are byte repacks ~= MXU-cost — measured).
    The MXU consumes the (K, M) operand directly via dot_general contracting
    dim 0; acc/output orientation is unchanged (bm, bn)."""
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    from .qms32 import fused_requantize, q_multiply_shift_select

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    m0 = pl.multiple_of(pl.program_id(0) * bm, bm)
    win = x_ref[:, pl.ds(m0, bm + pad)]   # (bk, bm+pad): lane-dim window
    bk = win.shape[0]
    dn = (((0,), (0,)), ((), ()))         # contract lhs dim0 x rhs dim0
    for (a, b) in taps:
        off = a * wph + b
        patch = lax.slice(win, (0, off), (bk, off + bm))
        acc_ref[...] += lax.dot_general(
            patch, w_ref[a, b], dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _epilogue():
        acc = acc_ref[...] + bias_ref[...]
        if fuse:
            v = fused_requantize(acc, m_ref[...], s_ref[...], shift_values,
                                 rounding, out_zp, qmin, qmax, rq_mode)
            o_ref[...] = v.astype(o_ref.dtype)
        else:
            o_ref[...] = acc


@functools.lru_cache(maxsize=None)
def _build_flat_conv(mp, fhx, cin_p, cout_p, khp, kwp, wph, bm, bn, bk,
                     fuse, out_zp, rounding, qmin, qmax, out_dtype,
                     shift_values, interpret, layout=None, wslack=None,
                     rq_mode=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_k = cin_p // bk
    grid = (mp // bm, cout_p // bn, n_k)
    taps = tuple((a, b) for a in range(khp) for b in range(kwp))
    kernels = {None: _flat_conv_kernel, "t": _flat_conv_kernel_t,
               "s": _flat_conv_kernel_s, "w": _flat_conv_kernel_w,
               "r": _flat_conv_kernel_r}
    kernel = functools.partial(
        kernels[layout],
        taps=taps, wph=wph, bm=bm,
        pad=wslack if wslack is not None else fhx - mp, n_k=n_k,
        fuse=fuse, out_zp=out_zp, rounding=rounding, qmin=qmin, qmax=qmax,
        shift_values=shift_values, rq_mode=rq_mode,
    )
    kw_extra = {}
    if not interpret:
        kw_extra["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        )
        kw_extra["cost_estimate"] = pl.CostEstimate(
            flops=2 * mp * cout_p * khp * kwp * cin_p,
            bytes_accessed=fhx * cin_p + khp * kwp * cin_p * cout_p
            + mp * cout_p * (1 if fuse else 4),
            transcendentals=0,
        )
    if layout == "t":
        x_spec = pl.BlockSpec((bk, fhx), lambda i, j, k: (k, 0))
    else:
        x_spec = pl.BlockSpec((fhx, bk), lambda i, j, k: (0, k))
    if layout == "w":
        # weights pre-arranged (cin_p, khp*kwp, cout_p): one (bk, T*bn) dot
        w_spec = pl.BlockSpec((bk, khp * kwp, bn), lambda i, j, k: (k, 0, j))
    elif layout == "r":
        # weights pre-arranged (kwp, khp, cin_p, cout_p): per-column-tap
        # (khp*bk, bn) operands matching the lane-concat patch order
        w_spec = pl.BlockSpec((kwp, khp, bk, bn), lambda i, j, k: (0, 0, k, j))
    else:
        w_spec = pl.BlockSpec((khp, kwp, bk, bn), lambda i, j, k: (0, 0, k, j))
    scratch = [pltpu.VMEM((bm, bn), jnp.int32)]
    if layout == "s":
        scratch.append(pltpu.VMEM((bm, khp * kwp * bk), jnp.int8))
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (mp, cout_p), jnp.dtype(out_dtype) if fuse else jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                # whole flat image: constant across (i, j) so Pallas fetches
                # it once per k-block, not per M/N tile
                x_spec,
                w_spec,
                pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
                # multiplier row, or (4, bn) [m; blo; bhi; cp] clamp block
                pl.BlockSpec(
                    (4 if rq_mode in ("clamp16", "clamp11") else 1, bn),
                    lambda i, j, k: (0, j)),
                pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            scratch_shapes=scratch,
        ),
        interpret=interpret,
        **kw_extra,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# VPU depthwise kernel
# ---------------------------------------------------------------------------

def _flat_dw_kernel(x_ref, w_ref, bias_ref, m_ref, s_ref, o_ref, *,
                    taps: tuple, wph: int, n_rows: int, mchunk: int,
                    out_zp: int, rounding: str, qmin: int, qmax: int,
                    shift_values: tuple, rq_mode: str | None = None):
    """x_ref (1, P, FHX, bc); w_ref (n_taps, bc); o_ref (1, n_rows_p, bc).

    taps: ((phase_idx, flat_offset, tap_idx), ...) — per-phase tap lists so
    polyphase stride decomposition wastes no MACs."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from .qms32 import fused_requantize, q_multiply_shift_select

    from jax import lax

    pad = x_ref.shape[2] - o_ref.shape[1]  # >= maxoff, static
    bc = w_ref.shape[-1]
    n_chunks = _cdiv(n_rows, mchunk)
    phases = sorted({p for (p, _, _) in taps})
    for ci in range(n_chunks):
        r0 = ci * mchunk  # static, mchunk-aligned
        # upcast each phase window to int32 ONCE: row shifts on 32-bit
        # values are native sublane rotates (int8 is (4,1)-packed, where a
        # shift by 1 row would be a byte shuffle)
        wins = {p: x_ref[0, p, pl.ds(r0, mchunk + pad), :].astype(jnp.int32)
                for p in phases}
        acc = jnp.zeros((mchunk, bc), jnp.int32)
        for (p, off, t) in taps:
            patch = lax.slice(wins[p], (off, 0), (off + mchunk, bc))
            acc = acc + patch * w_ref[t][None, :].astype(jnp.int32)
        acc = acc + bias_ref[...]
        v = fused_requantize(acc, m_ref[...], s_ref[...], shift_values,
                             rounding, out_zp, qmin, qmax, rq_mode)
        o_ref[0, pl.ds(r0, mchunk), :] = v.astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_flat_dw(n, p, fhx, c_p, n_rows, n_rows_p, n_taps, bc, mchunk,
                   taps, wph, out_zp, rounding, qmin, qmax, out_dtype,
                   shift_values, interpret, rq_mode=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n, c_p // bc)
    kernel = functools.partial(
        _flat_dw_kernel, taps=taps, wph=wph, n_rows=n_rows, mchunk=mchunk,
        out_zp=out_zp, rounding=rounding, qmin=qmin, qmax=qmax,
        shift_values=shift_values, rq_mode=rq_mode,
    )
    kw_extra = {}
    if not interpret:
        kw_extra["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        )
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n_rows_p, c_p), jnp.dtype(out_dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, p, fhx, bc), lambda b, j: (b, 0, 0, j)),
                pl.BlockSpec((n_taps, bc), lambda b, j: (0, j)),
                pl.BlockSpec((1, bc), lambda b, j: (0, j)),
                pl.BlockSpec(
                    (4 if rq_mode in ("clamp16", "clamp11") else 1, bc),
                    lambda b, j: (0, j)),
                pl.BlockSpec((1, bc), lambda b, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, n_rows_p, bc), lambda b, j: (b, 0, j)),
        ),
        interpret=interpret,
        **kw_extra,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# geometry / phase decomposition helpers
# ---------------------------------------------------------------------------

def _phase_geometry(h, w, kh, kw, sh, sw, padding):
    """Output + phase-image geometry for the polyphase stride-1 rewrite."""
    pt, pl_, pb, pr = padding
    hp0, wp0 = h + pt + pb, w + pl_ + pr
    oh = (hp0 - kh) // sh + 1
    ow = (wp0 - kw) // sw + 1
    khp = _cdiv(kh, sh)
    kwp = _cdiv(kw, sw)
    hph = oh + khp - 1   # phase image height (stride-1 conv geometry)
    wph = ow + kwp - 1
    return oh, ow, khp, kwp, hph, wph


def _phase_stack(x, kh, kw, sh, sw, padding, izp):
    """(N,H,W,C) -> (N, Hph, Wph, sh*sw*C) phase-stacked stride-1 image.

    All spatial padding uses the input zero point so the folded-bias zero
    point correction stays exact."""
    import jax.numpy as jnp

    n, h, w, c = x.shape
    pt, pl_, pb, pr = padding
    oh, ow, khp, kwp, hph, wph = _phase_geometry(h, w, kh, kw, sh, sw, padding)
    hs, ws = hph * sh, wph * sw
    xp = jnp.pad(
        x,
        ((0, 0), (pt, hs - h - pt), (pl_, ws - w - pl_), (0, 0)),
        constant_values=np.int8(izp),
    )
    if (sh, sw) == (1, 1):
        return xp, (oh, ow, khp, kwp, hph, wph)
    xr = xp.reshape(n, hph, sh, wph, sw, c)
    xr = jnp.transpose(xr, (0, 1, 3, 2, 4, 5)).reshape(n, hph, wph, sh * sw * c)
    return xr, (oh, ow, khp, kwp, hph, wph)


def _phase_weights(w, sh, sw):
    """(KH,KW,CIN,COUT) -> (KH',KW',sh*sw*CIN,COUT) polyphase weights."""
    import jax.numpy as jnp

    kh, kw, cin, cout = w.shape
    khp, kwp = _cdiv(kh, sh), _cdiv(kw, sw)
    wp = jnp.zeros((khp, kwp, sh, sw, cin, cout), w.dtype)
    wj = jnp.asarray(w)
    for p in range(sh):
        for q in range(sw):
            na = _cdiv(kh - p, sh)
            nb = _cdiv(kw - q, sw)
            if na <= 0 or nb <= 0:
                continue
            wp = wp.at[:na, :nb, p, q].set(wj[p::sh, q::sw])
    return wp.reshape(khp, kwp, sh * sw * cin, cout)


def _pick_conv_blocks(mp, cin_p, cout_p, khp, kwp, fhx):
    """(bm, bn, bk) under the VMEM budget; prefer wide N for tap-slice
    amortization, large K blocks for reduction locality, and LARGE M blocks
    at big spatial extents (the round-3 sweep measured bm=1024/4096 ~20%
    ahead of 512 at the 56^2 geometry: fewer grid cells amortize the
    per-cell byte-phase window extraction)."""
    # ...but only single-K-block shapes (cin_p <= 128): the same sweep put
    # bm=512/bk=256 ahead at 28^2x256 (deep-K reduction locality wins there)
    bms = (4096, 2048, 1024, 512, 256, 128) \
        if (mp >= 16384 and cin_p <= 128) else (512, 256, 128)
    for bk in (min(cin_p, 512), 256, 128):
        if bk > cin_p or cin_p % bk:
            continue
        for bn in (512, 256, 128):
            if bn > cout_p or cout_p % bn:
                continue
            for bm in bms:
                if bm > mp or mp % bm:
                    continue
                vm = (2 * fhx * bk                       # flat image (dbuf)
                      + 2 * khp * kwp * bk * bn          # weights
                      + bm * bn * 4                      # acc scratch
                      + 2 * bm * bn)                     # out block
                if vm <= _VMEM_BUDGET:
                    return bm, bn, bk
    return None


def _flat_lengths(n, hph, wph, khp, kwp, bm):
    fh = hph * wph
    maxoff = (khp - 1) * wph + (kwp - 1)
    mp = _round_up(n * fh, bm)
    # +4: the in-kernel byte-phase windows slice [r, r + bm + pad - 4)
    fhx = mp + _round_up(max(maxoff, 1) + 4, 32)
    return fh, mp, fhx


def _flat_lengths_tight(n, hph, wph, oh, ow, khp, kwp, bm, margin=0):
    """Single-pad geometry: inflate the per-image frame height until the
    batch-folded flat image (n * hp * wph rows, built by ONE jnp.pad of the
    4-D input) covers the M grid plus the in-kernel window slack — so the
    wrapper never needs a second row-padding pass.

    margin extends the computed-row requirement past the last valid output
    (frame chains must COMPUTE the masked bottom-margin rows the next
    stage's taps read — unwritten rows are garbage in compiled mode).

    Returns (fh, mp, fhx, hp, slack) with fhx == n * fh, or None if no
    frame height within +64 rows works (callers fall back to the two-pad
    path)."""
    maxoff = (khp - 1) * wph + (kwp - 1)
    slack = _round_up(max(maxoff, 1) + 4, 32)
    for hp in range(hph, hph + 65):
        fh = hp * wph
        need = (n - 1) * fh + oh * wph + margin  # last image's valid rows
        mp = _round_up(need, bm)                 # (+ chained-tap margin)
        if mp + slack <= n * fh:
            return fh, mp, n * fh, hp, slack
    return None


def _im2col_viable(cin_s, khp, kwp) -> bool:
    # the im2col fallback materializes (M, khp*kwp*cin_s) patches in HBM:
    # worth it only while K stays a modest MXU contraction
    return khp * kwp * cin_s <= 1024


def qconv2d_flat_supported(x_shape, w_shape, strides, padding,
                           groups: int) -> bool:
    n, h, w, cin = x_shape
    kh, kw, wcin, cout = w_shape
    sh, sw = strides
    if groups == 1:
        if kh == 1 and kw == 1:
            return True  # matmul route
        oh, ow, khp, kwp, hph, wph = _phase_geometry(
            h, w, kh, kw, sh, sw, padding)
        cin_p = _round_up(sh * sw * cin, 128)
        cout_p = _round_up(cout, 128)
        fh, mp, fhx = _flat_lengths(n, hph, _round_up(wph, 4), khp, kwp, 512)
        if _pick_conv_blocks(mp, cin_p, cout_p, khp, kwp, fhx) is not None:
            return True
        # image too large for the VMEM-resident kernel (e.g. the 224^2 stem):
        # XLA im2col + tuned Pallas matmul
        return _im2col_viable(sh * sw * cin, khp, kwp)
    if groups == cin and wcin == 1:  # depthwise
        oh, ow, khp, kwp, hph, wph = _phase_geometry(
            h, w, kh, kw, sh, sw, padding)
        p = sh * sw
        fh = hph * wph
        maxoff = (khp - 1) * wph + (kwp - 1)
        fhx = _round_up(oh * wph + maxoff, 32)
        bc = 128
        vm = 2 * p * fhx * bc + 2 * _round_up(oh * wph, 32) * bc \
            + 512 * bc * 4
        return vm <= _VMEM_BUDGET
    return False


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def qconv2d_flat(
    x, w, bias=None, multiplier=None, shift=None, *,
    strides=(1, 1), padding=(0, 0, 0, 0), groups: int = 1,
    input_zero_point: int = 0,
    out_zp: int = 0, rounding: str = "UPWARD", out_dtype: str = "int8",
    qmin: int = -128, qmax: int = 127,
    blocks: tuple | None = None, layout: str | None = None,
):
    """NHWC int8 conv with fused exact requantize (flat shifted-matmul).

    Same contract as the round-1 `conv_int8.qconv2d_int8`: x (N,H,W,CIN)
    int8, w (KH,KW,CIN/groups,COUT) int8, groups in {1, CIN(depthwise)};
    nonzero input_zero_point folds into the bias via weight column sums."""
    import jax.numpy as jnp

    n, h, wd, cin = x.shape
    kh, kw, wcin, cout = w.shape
    sh, sw = strides

    bias_arr = (jnp.zeros((cout,), jnp.int32) if bias is None
                else jnp.asarray(bias, jnp.int32))
    if input_zero_point:
        colsum = jnp.sum(jnp.asarray(w, jnp.int32),
                         axis=(0, 1, 2) if groups == 1 else (0, 1))
        if groups != 1:
            colsum = colsum.reshape(-1)
        bias_arr = bias_arr - jnp.int32(input_zero_point) * colsum

    fuse = multiplier is not None
    if fuse:
        # HOST arrays: downstream qmatmul/tuner paths derive static shift
        # sets with np.asarray, which must not see tracers
        m_arr = np.ascontiguousarray(
            np.broadcast_to(np.asarray(multiplier, np.int32), (cout,)))
        s_arr = np.ascontiguousarray(
            np.broadcast_to(np.asarray(shift, np.int32), (cout,)))
        shift_values = tuple(sorted({int(v) for v in np.atleast_1d(np.asarray(shift))}))
    else:
        m_arr = s_arr = None
        shift_values = ()

    interp = _interpret_default()

    if groups == 1 and kh == 1 and kw == 1:
        # pass the caller's (host) multiplier/shift: qmatmul_int8 derives the
        # static shift-value set with np.asarray, which must not see tracers
        return _conv1x1_matmul(
            x, w, bias_arr, multiplier, shift, strides, padding,
            input_zero_point, out_zp, rounding, out_dtype, qmin, qmax, fuse)

    if (groups == 1 and sh * sw * cin < 64 and kh * kw * cin <= 1024
            and fuse and n * h * wd >= 65536):
        # small-channel stems (e.g. ResNet 7x7 s2 cin=3): the polyphase flat
        # kernel pads cin_s to the 128-lane MXU minimum (>=2x, 10.7x for the
        # stem) and the C=3 phase-stack transposes are XLA-pathological —
        # measured 1.0 ms for the stem where XLA's own conv emitter (which
        # handles tiny-cin via its internal space-to-depth) does it in
        # 0.40 ms.  EXACT integer semantics: int8 operands are exactly
        # representable even in bf16 (|x| <= 128 < 2^8), the MXU accumulates
        # in f32, and every partial sum is an integer <= 2^24: int8 reaches
        # -128 (izp is folded into bias, the conv sees raw x), so the bound
        # is kh*kw*cin*128^2 <= 1024*16384 = 2^24, exactly representable in
        # f32.  Gate therefore requires kh*kw*cin <= 1024 (= 2^24/128^2).
        # The f32 accumulator is the exact int32 accumulator.  Verified ==
        # on v5e and CPU, including a +/-128-saturated case
        # (scripts/probe_stem.py, tests/test_pallas_conv_flat.py).
        # Route choice, from interleaved in-process A/B on v5e
        # (scripts/r5_stem_ab_inproc.py, /tmp/r5/stem_ab_inproc.json +
        # stem_e2e_ab.log):
        #   * kdim = khp*kwp*sh*sw*cin >= 128 (ResNet 7x7 s2: 192): the
        #     s2d+im2col+Pallas-matmul route wins at EVERY batch
        #     (e2e -34% b8 / -33% b32) — no conv emitter, so no
        #     batch-independent tiny-cin lowering cost;
        #   * kdim < 128 (MobileNet 3x3 s2: 48, K pads >=2.7x): im2col
        #     wins only once M is large (b32 7.9 vs 11.1 ms, and 8x
        #     tighter IQR) and LOSES at b8 (4.3 vs 1.5) — f32 emitter
        #     keeps small-M, im2col takes M >= 300k.
        # TK_STEM_ROUTE=f32|im2col forces a route.
        khp_, kwp_ = -(-kh // sh), -(-kw // sw)
        kdim = khp_ * kwp_ * sh * sw * cin
        big_m = n * (h // sh) * (wd // sw) >= 300_000
        pick = os.environ.get("TK_STEM_ROUTE",
                              "im2col" if (kdim >= 128 or big_m) else "f32")
        if pick == "f32":
            return _conv_f32_exact(
                x, w, bias_arr, multiplier, shift, strides, padding,
                input_zero_point, out_zp, rounding, out_dtype, qmin, qmax)
        return _conv_stem_im2col(
            x, w, bias_arr, multiplier, shift, strides, padding,
            input_zero_point, out_zp, rounding, out_dtype, qmin, qmax)

    # XLA-native int8 conv route (round 5; full-output-feedback protocol,
    # scripts/r5_xla_conv_probe.py, all output-verified): DEPTHWISE routes
    # through XLA — 3-5x the VPU tap path isolated (112^2c96s2: 41 vs
    # 209 us) and 1.8-2.1x e2e (MobileNetV2 b8 2.93 -> 1.38 ms).  The
    # strided groups==1 route measured 2x isolated (25.1 vs 52 us) but
    # REGRESSED e2e (ResNet-50 b8 2.445 -> 3.23 ms: the int32 round trip
    # + layout conversion next to Pallas consumers — the round-4
    # XLA-composed-with-Pallas-operand pathology), so it is opt-in only.
    # TK_CONV_ROUTE=pallas opts out entirely; =xla forces XLA everywhere.
    route = os.environ.get("TK_CONV_ROUTE", "")
    if fuse and out_dtype in ("int8", "uint8") and route != "pallas":
        dw = groups == cin and wcin == 1 and groups > 1
        if dw or route == "xla":
            return _conv_xla_int8(
                x, w, bias_arr, m_arr, s_arr, strides, padding, groups,
                input_zero_point, out_zp, rounding, out_dtype, qmin, qmax)

    if groups == 1:
        return _conv_mxu(
            x, w, bias_arr, m_arr, s_arr, shift_values, strides, padding,
            input_zero_point, out_zp, rounding, out_dtype, qmin, qmax,
            fuse, blocks, interp, layout)
    elif groups == cin and wcin == 1:
        if not fuse:
            raise NotImplementedError("flat depthwise requires fused requantize")
        return _conv_dw_vpu(
            x, w, bias_arr, m_arr, s_arr, shift_values, strides, padding,
            input_zero_point, out_zp, rounding, out_dtype, qmin, qmax, interp)
    raise NotImplementedError("flat conv supports groups==1 or depthwise")


def _conv_xla_int8(x, w, bias_arr, m_arr, s_arr, strides, padding, groups,
                   izp, out_zp, rounding, out_dtype, qmin, qmax):
    """XLA-native int8 conv (int32 MXU accumulation) + exact XLA-side
    requantize (qms32.q_multiply_shift_u32's high-word fast path).

    Exactness: int8 x int8 -> int32 accumulation is exact; qnn's izp
    border padding is PRE-APPLIED (XLA pads zeros) so the standard
    colsum-into-bias izp fold (already done by the caller) holds at the
    borders; the requantize is the pinned fixed-point semantics
    (requantize.cc), bit-equal to the oracle."""
    import jax.numpy as jnp
    from jax import lax

    from .qms32 import q_multiply_shift_u32

    pt, pl_, pb, pr = padding
    if pt or pl_ or pb or pr:
        x = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)),
                    constant_values=np.int8(izp))
    acc = lax.conv_general_dilated(
        x, jnp.asarray(w), strides, ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    acc = acc + bias_arr.reshape(1, 1, 1, -1)
    if m_arr.size > 1 or s_arr.size > 1:
        mm = np.broadcast_to(m_arr, (acc.shape[-1],)).reshape(1, 1, 1, -1)
        ss = np.broadcast_to(s_arr, (acc.shape[-1],)).reshape(1, 1, 1, -1)
        v = q_multiply_shift_u32(acc, np.ascontiguousarray(mm),
                                 np.ascontiguousarray(ss), rounding)
    else:
        v = q_multiply_shift_u32(acc, int(m_arr.ravel()[0]),
                                 int(s_arr.ravel()[0]), rounding)
    if out_zp:
        v = v + jnp.int32(out_zp)
    return jnp.clip(v, jnp.int32(qmin),
                    jnp.int32(qmax)).astype(jnp.dtype(out_dtype))


def _conv_f32_exact(x, w, bias_arr, multiplier, shift, strides, padding,
                    izp, out_zp, rounding, out_dtype, qmin, qmax):
    """XLA f32 conv with exact integer semantics + exact fixed-point
    requantize (see the dispatch comment in qconv2d_flat for the exactness
    argument and measurements)."""
    import jax.numpy as jnp
    from jax import lax

    from ..fixed_point import (q_multiply_shift_jnp,
                               q_multiply_shift_per_axis_jnp)

    pt, pl_, pb, pr = padding
    if any(padding):
        x = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)),
                    constant_values=np.int8(izp))
    acc = lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.asarray(w, jnp.float32),
        window_strides=strides, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    acc = acc.astype(jnp.int32) + bias_arr.astype(jnp.int32)
    m_np = np.atleast_1d(np.asarray(multiplier, np.int64))
    s_np = np.atleast_1d(np.asarray(shift, np.int64))
    if m_np.size > 1 or s_np.size > 1:
        cout = acc.shape[-1]
        v = q_multiply_shift_per_axis_jnp(
            acc, np.broadcast_to(m_np, (cout,)),
            np.broadcast_to(s_np, (cout,)), axis=-1, rounding=rounding)
    else:
        v = q_multiply_shift_jnp(acc, int(m_np[0]), int(s_np[0]),
                                 rounding=rounding)
    if out_zp:
        v = v + jnp.int32(out_zp)
    v = jnp.clip(v, jnp.int32(qmin), jnp.int32(qmax))
    return v.astype(jnp.dtype(out_dtype))


def _conv_stem_im2col(x, w, bias_arr, multiplier, shift, strides, padding,
                      izp, out_zp, rounding, out_dtype, qmin, qmax):
    """Small-cin stem route with NO conv emitter anywhere: space-to-depth
    (reshape+transpose, exact relabeling) + im2col built from khp*kwp
    UNIT-STRIDE slices + the tuned Pallas int8 matmul with the exact
    clamped-requantize epilogue.

    Every conv-emitter route (XLA f32/bf16/int8, s2d+XLA-int8, polyphase
    flat) pays a ~0.8-1.6 ms BATCH-INDEPENDENT fixed cost inside XLA's
    tiny-cin conv lowering (scripts/r5_stem_probe.py); this route sidesteps
    the emitter entirely.  Exactness: the stride-(sh,sw) conv over cin
    channels is an EXACT relabeling of a stride-1 khp x kwp conv over the
    s2d image's sh*sw*cin channels (tap (u,v) phase (p,q) = w[sh*u+p,
    sw*v+q]); borders and the geometry tail are padded with izp, which
    contributes exactly 0 after the izp fold into bias (izp*colsum is
    subtracted for EVERY tap, and padded taps contribute izp*w).  The
    matmul epilogue is the pinned qms32 requantize.  Bit-compared == vs
    qconv2d_flat on-chip and on CPU (scripts/r5_stem_im2col.py,
    tests/test_pallas_conv_flat.py)."""
    import jax.numpy as jnp

    from .matmul_int8 import qmatmul_int8

    n, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    sh, sw = strides
    pt, pl_, pb, pr = padding
    oh = (h + pt + pb - kh) // sh + 1
    ow = (wd + pl_ + pr - kw) // sw + 1
    khp = -(-kh // sh)
    kwp = -(-kw // sw)
    hp = sh * (oh + khp - 1)
    wp = sw * (ow + kwp - 1)
    x = jnp.pad(x, ((0, 0), (pt, hp - h - pt), (pl_, wp - wd - pl_),
                    (0, 0)), constant_values=np.int8(izp))
    cs = sh * sw * cin
    y = x.reshape(n, hp // sh, sh, wp // sw, sw, cin)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // sh, wp // sw, cs)
    pat = jnp.concatenate(
        [y[:, u:u + oh, v:v + ow, :]
         for u in range(khp) for v in range(kwp)], axis=-1)
    flat = pat.reshape(n * oh * ow, khp * kwp * cs)
    # scattered stride-1 weights, host-side (w is host int8)
    wh = np.asarray(w)
    wsc = np.zeros((khp * kwp * cs, cout), np.int8)
    for u in range(khp):
        for v in range(kwp):
            for p in range(sh):
                for q in range(sw):
                    ki, kj = sh * u + p, sw * v + q
                    if ki < kh and kj < kw:
                        base = (u * kwp + v) * cs + (p * sw + q) * cin
                        wsc[base:base + cin] = wh[ki, kj]
    # bk = K when K is a lane-safe multiple (>=128, 32-granular): skips the
    # K -> next-pow2-block HBM re-pad of the (M,K) patch matrix (measured
    # 493 vs 514 us at the b8 stem, scripts/r5_stem_im2col.py); bm=512 /
    # bn=128 swept best there.  Other K falls to the DB/default path.
    kdim = khp * kwp * cs
    blocks = ((512, 128, kdim)
              if kdim % 32 == 0 and 128 <= kdim <= 512 else None)
    out = qmatmul_int8(flat, wsc, bias=bias_arr, multiplier=multiplier,
                       shift=shift, out_zp=out_zp, rounding=rounding,
                       out_dtype=out_dtype, qmin=qmin, qmax=qmax,
                       blocks=blocks)
    return out.reshape(n, oh, ow, cout)


def _conv1x1_matmul(x, w, bias_arr, m_arr, s_arr, strides, padding,
                    izp, out_zp, rounding, out_dtype, qmin, qmax, fuse):
    """1x1 conv == GEMM on the tuned Pallas matmul; stride subsamples first."""
    import jax.numpy as jnp

    from .matmul_int8 import qmatmul_int8

    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    sh, sw = strides
    pt, pl_, pb, pr = padding
    if any(padding):
        x = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)),
                    constant_values=np.int8(izp))
    if (sh, sw) != (1, 1):
        # reshape-form decimation: an XLA STRIDED int8 slice composed with
        # a Pallas operand layout is pathological (measured 677 us at
        # (8,14,14,1024) — 19% of ResNet-50 b8 e2e — vs 3 us for the
        # reshape + unit-stride slice form; scripts/r4_decim.py).  Pad to
        # stride multiples first; padded rows are never selected (group
        # index 0 of each stride block is always a real row).
        from jax import lax

        n_, hh, ww, cc = x.shape
        oh_, ow_ = -(-hh // sh), -(-ww // sw)
        if hh % sh or ww % sw:
            x = jnp.pad(x, ((0, 0), (0, oh_ * sh - hh),
                            (0, ow_ * sw - ww), (0, 0)))
        v = x.reshape(n_, oh_, sh, ow_, sw, cc)
        x = lax.slice(v, (0, 0, 0, 0, 0, 0),
                      (n_, oh_, 1, ow_, 1, cc)).reshape(n_, oh_, ow_, cc)
    n, oh, ow, _ = x.shape
    xm = x.reshape(n * oh * ow, cin)
    wm = jnp.asarray(w).reshape(cin, cout)
    if fuse:
        out = qmatmul_int8(
            xm, wm, bias=bias_arr, multiplier=m_arr, shift=s_arr,
            out_zp=out_zp, rounding=rounding, out_dtype=out_dtype,
            qmin=qmin, qmax=qmax)
    else:
        out = qmatmul_int8(xm, wm, bias=bias_arr)
    return out.reshape(n, oh, ow, cout)


def _pack_rq(m_arr, s_arr, out_zp, qmin, qmax, rounding, cout, cout_p):
    """(rq_mode, mx): the clamped-requantize plan padded to the kernel's
    channel block — or (None, None) when ineligible (qms32.plan_rq_clamp).
    Padded channels get m=0 / window [0,0]; their outputs are sliced off."""
    from .qms32 import plan_rq_clamp

    mode, rows = plan_rq_clamp(np.asarray(m_arr), np.asarray(s_arr),
                               int(out_zp), qmin, qmax, rounding)
    if mode is None:
        return None, None
    mx = np.zeros((4, cout_p), np.int32)
    mx[:, :cout] = rows
    return mode, mx


def _conv_mxu(x, w, bias_arr, m_arr, s_arr, shift_values, strides, padding,
              izp, out_zp, rounding, out_dtype, qmin, qmax, fuse, blocks,
              interp, layout=None):
    import jax.numpy as jnp

    n, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    sh, sw = strides
    s1 = (sh, sw) == (1, 1)

    if s1:
        # stride-1 fast path: defer ALL input padding to one jnp.pad once
        # the block geometry is known (wph4 below)
        oh, ow, khp, kwp, hph, wph = _phase_geometry(
            h, wd, kh, kw, 1, 1, padding)
        xs = None
    else:
        xs, (oh, ow, khp, kwp, hph, wph) = _phase_stack(
            x, kh, kw, sh, sw, padding, izp)
    # pad the phase-image width to a multiple of 4 so row-tap offsets stay
    # int8-pack-aligned in the kernel (extra over-wide garbage columns only)
    wph4 = _round_up(wph, 4)
    if wph4 != wph:
        if xs is not None:
            xs = jnp.pad(xs, ((0, 0), (0, 0), (0, wph4 - wph), (0, 0)),
                         constant_values=np.int8(izp))
        wph = wph4
    wps = _phase_weights(jnp.asarray(w), sh, sw)  # (khp,kwp,P*cin,cout)
    cin_s = wps.shape[2]
    cin_p = _round_up(cin_s, 128)
    cout_p = _round_up(cout, 128)

    def _blocks_valid(b):
        bm_, bn_, bk_ = b
        return (bm_ > 0 and bn_ > 0 and bk_ > 0
                and bn_ <= cout_p and cout_p % bn_ == 0
                and bk_ <= cin_p and cin_p % bk_ == 0)

    if blocks is None:
        from ...tune.database import lookup_config

        cfg = lookup_config(flat_conv_workload(
            n, h, wd, cin, cout, kh, kw, strides, fuse))
        if cfg and "blocks" in cfg:
            cand = tuple(cfg["blocks"])
            # a stale/foreign DB record must never select an unrunnable
            # geometry — fall back to the auto pick instead
            if _blocks_valid(cand):
                blocks = cand
                if layout is None:
                    layout = cfg.get("layout")
    elif not _blocks_valid(blocks):
        # an N block that exceeds (or does not divide) the padded channel
        # count yields a ZERO-cell grid: the output buffer is never
        # written — garbage values at launch-overhead speed
        raise ValueError(
            f"conv blocks {blocks} invalid for padded geometry "
            f"cout_p={cout_p}, cin_p={cin_p}: bn/bk must divide them")
    vmap_batch = False
    if blocks is not None:
        bm, bn, bk = blocks
        fh, mp, fhx = _flat_lengths(n, hph, wph, khp, kwp, bm)
    else:
        fh, mp, fhx = _flat_lengths(n, hph, wph, khp, kwp, 512)
        picked = _pick_conv_blocks(mp, cin_p, cout_p, khp, kwp, fhx)
        if picked is None and n > 1:
            # the batch-folded flat image exceeds VMEM (big images): run the
            # SINGLE-IMAGE kernel under jax.vmap — the batch becomes the
            # outermost Pallas grid dimension, per-cell VMEM is per-image
            fh1, mp1, fhx1 = _flat_lengths(1, hph, wph, khp, kwp, 512)
            picked = _pick_conv_blocks(mp1, cin_p, cout_p, khp, kwp, fhx1)
            if picked is not None:
                vmap_batch = True
                fh, mp, fhx = fh1, mp1, fhx1
        if picked is None:
            # still too big: XLA im2col over the same flat geometry + the
            # tuned Pallas matmul
            if _im2col_viable(cin_s, khp, kwp):
                return _conv_im2col(
                    xs, wps, bias_arr, m_arr, s_arr, n, oh, ow, khp, kwp,
                    hph, wph, cin_s, cout, out_zp, rounding, out_dtype,
                    qmin, qmax, fuse)
            raise ValueError("flat conv exceeds VMEM budget; use the XLA path")
        bm, bn, bk = picked
        if not vmap_batch:
            fh, mp, fhx = _flat_lengths(n, hph, wph, khp, kwp, bm)
        else:
            fh, mp, fhx = _flat_lengths(1, hph, wph, khp, kwp, bm)

    transposed = layout == "t"

    tight = None
    if s1 and not vmap_batch:
        tight = _flat_lengths_tight(n, hph, wph, oh, ow, khp, kwp, bm)
    if tight is not None:
        # single-pad wrapper: ONE XLA pass builds the batch-folded flat
        # image (frame height inflated so the M grid + window slack fit
        # inside n*fh rows), ONE pass extracts the output
        fh, mp, fhx, hp_, slack = tight
        pt, pl_, pb, pr = padding
        xpad = jnp.pad(
            x, ((0, 0), (pt, hp_ - h - pt), (pl_, wph - wd - pl_),
                (0, cin_p - cin_s)),
            constant_values=np.int8(izp))
        xflat = xpad.reshape(n * fh, cin_p)
        if transposed:
            xflat = jnp.transpose(xflat)
        wfull = jnp.pad(wps, ((0, 0), (0, 0), (0, cin_p - cin_s),
                              (0, cout_p - cout)))
        if layout == "w":
            wfull = jnp.transpose(wfull, (2, 0, 1, 3)).reshape(
                cin_p, khp * kwp, cout_p)
        elif layout == "r":
            wfull = jnp.transpose(wfull, (1, 0, 2, 3))
        pad1 = lambda a, cv=0: jnp.pad(
            a, (0, cout_p - cout), constant_values=cv).reshape(1, cout_p)
        rq_mode = None
        if fuse:
            rq_mode, mx = _pack_rq(m_arr, s_arr, out_zp, qmin, qmax,
                                   rounding, cout, cout_p)
            b1, s1v = pad1(bias_arr), pad1(s_arr)
            m1 = jnp.asarray(mx) if rq_mode else pad1(m_arr, 1)
        else:
            b1 = pad1(bias_arr)
            m1 = jnp.ones((1, cout_p), jnp.int32)
            s1v = jnp.zeros((1, cout_p), jnp.int32)
        fn = _build_flat_conv(
            mp, fhx, cin_p, cout_p, khp, kwp, wph, bm, bn, bk, fuse,
            int(out_zp), rounding, qmin, qmax, out_dtype, shift_values,
            interp, layout, wslack=slack, rq_mode=rq_mode)
        with _x32_tracing():
            out = fn(xflat, wfull, b1, m1, s1v)
        # single-pass exit: every valid output row lies below mp, so pad the
        # uncomputed tail, view as frames, and slice once (the per-image
        # slice+stack form cost an extra full copy)
        if mp < n * fh:
            out = jnp.pad(out, ((0, n * fh - mp), (0, 0)))
        out4 = out.reshape(n, hp_, wph, cout_p)
        return out4[:, :oh, :ow, :cout]

    if xs is None:
        # stride-1 but the tight single-pad geometry didn't apply
        # (vmap-batch big image or no frame height fit): classic pads
        xs, _ = _phase_stack(x, kh, kw, 1, 1, padding, izp)
        if xs.shape[2] != wph:
            xs = jnp.pad(xs, ((0, 0), (0, 0), (0, wph - xs.shape[2]),
                              (0, 0)), constant_values=np.int8(izp))

    if vmap_batch:
        xflat = xs.reshape(n, hph * wph, cin_s)
        xflat = jnp.pad(
            xflat, ((0, 0), (0, fhx - hph * wph), (0, cin_p - cin_s)))
        if transposed:
            xflat = jnp.transpose(xflat, (0, 2, 1))
    else:
        xflat = xs.reshape(n * hph * wph, cin_s)
        pad_rows = fhx - xflat.shape[0]
        xflat = jnp.pad(xflat, ((0, pad_rows), (0, cin_p - cin_s)))
        if transposed:
            # (M, C) -> (C, M): tap shifts become native lane shifts in-kernel
            xflat = jnp.transpose(xflat)
    wfull = jnp.pad(wps, ((0, 0), (0, 0), (0, cin_p - cin_s),
                          (0, cout_p - cout)))
    if layout == "w":
        # (khp, kwp, cin_p, cout_p) -> (cin_p, khp*kwp, cout_p): K on
        # sublanes feeding the single wide-N dot
        wfull = jnp.transpose(wfull, (2, 0, 1, 3)).reshape(
            cin_p, khp * kwp, cout_p)
    elif layout == "r":
        # (khp, kwp, cin_p, cout_p) -> (kwp, khp, cin_p, cout_p)
        wfull = jnp.transpose(wfull, (1, 0, 2, 3))

    pad1 = lambda a, cv=0: jnp.pad(
        a, (0, cout_p - cout), constant_values=cv).reshape(1, cout_p)
    rq_mode = None
    if fuse:
        rq_mode, mx = _pack_rq(m_arr, s_arr, out_zp, qmin, qmax, rounding,
                               cout, cout_p)
        b1, s1 = pad1(bias_arr), pad1(s_arr)
        m1 = jnp.asarray(mx) if rq_mode else pad1(m_arr, 1)
    else:
        b1 = pad1(bias_arr)
        m1 = jnp.ones((1, cout_p), jnp.int32)
        s1 = jnp.zeros((1, cout_p), jnp.int32)

    fn = _build_flat_conv(
        mp, fhx, cin_p, cout_p, khp, kwp, wph, bm, bn, bk, fuse,
        int(out_zp), rounding, qmin, qmax, out_dtype, shift_values, interp,
        layout, rq_mode=rq_mode)
    with _x32_tracing():
        if vmap_batch:
            import jax

            out = jax.vmap(
                lambda xi: fn(xi, wfull, b1, m1, s1))(xflat)  # (n, mp, cout_p)
            out = out[:, :fh].reshape(n, hph, wph, cout_p)
            return out[:, :oh, :ow, :cout]
        out = fn(xflat, wfull, b1, m1, s1)
    # (mp, cout_p) over-wide -> (n, oh, ow, cout)
    out = out[: n * fh].reshape(n, hph, wph, cout_p)
    return out[:, :oh, :ow, :cout]


def _conv_im2col(xs, wps, bias_arr, m_arr, s_arr, n, oh, ow, khp, kwp,
                 hph, wph, cin_s, cout, out_zp, rounding, out_dtype,
                 qmin, qmax, fuse):
    """XLA im2col on the flat phase-stacked image + tuned Pallas matmul.

    The big-image fallback (stem convs): tap patches are row-shifted slices
    of the flat image, concatenated on the channel axis into a
    (M, khp*kwp*cin_s) matrix — K stays a proper MXU contraction depth
    instead of the abysmal XLA int32 (or 40x-slow f32) conv."""
    import jax.numpy as jnp

    from .matmul_int8 import qmatmul_int8

    fh = hph * wph
    maxoff = (khp - 1) * wph + (kwp - 1)
    xflat = xs.reshape(n, fh, cin_s)
    xflat = jnp.pad(xflat, ((0, 0), (0, maxoff), (0, 0)))
    pieces = []
    for a in range(khp):
        for b in range(kwp):
            off = a * wph + b
            pieces.append(xflat[:, off: off + fh, :])
    patches = jnp.concatenate(pieces, axis=-1)      # (n, fh, K)
    k_full = khp * kwp * cin_s
    pm = patches.reshape(n * fh, k_full)
    wm = jnp.asarray(wps).reshape(k_full, wps.shape[-1])[:, :cout]
    if fuse:
        out = qmatmul_int8(pm, wm, bias=bias_arr, multiplier=m_arr,
                           shift=s_arr, out_zp=out_zp, rounding=rounding,
                           out_dtype=out_dtype, qmin=qmin, qmax=qmax)
    else:
        out = qmatmul_int8(pm, wm, bias=bias_arr)
    out = out.reshape(n, hph, wph, cout)
    return out[:, :oh, :ow]


def _conv_dw_vpu(x, w, bias_arr, m_arr, s_arr, shift_values, strides,
                 padding, izp, out_zp, rounding, out_dtype, qmin, qmax,
                 interp):
    import jax.numpy as jnp

    n, h, wd, c = x.shape
    kh, kw, _, cout = w.shape
    sh, sw = strides
    pnum = sh * sw

    oh, ow, khp, kwp, hph, wph = _phase_geometry(h, wd, kh, kw, sh, sw, padding)
    hs, ws = hph * sh, wph * sw
    pt, pl_, pb, pr = padding
    xp = jnp.pad(
        x, ((0, 0), (pt, hs - h - pt), (pl_, ws - wd - pl_), (0, 0)),
        constant_values=np.int8(izp))
    # phases unstacked: (N, P, Hph, Wph, C)
    xr = xp.reshape(n, hph, sh, wph, sw, c)
    xr = jnp.transpose(xr, (0, 2, 4, 1, 3, 5)).reshape(n, pnum, hph, wph, c)

    # exact per-phase tap lists: tap (a,b) of phase (p,q) uses w[a*sh+p, b*sw+q]
    taps = []
    wrows = []
    wj = jnp.asarray(w).reshape(kh, kw, c)
    for p in range(sh):
        for q in range(sw):
            for a in range(_cdiv(kh - p, sh)):
                for b in range(_cdiv(kw - q, sw)):
                    taps.append((p * sw + q, a * wph + b, len(wrows)))
                    wrows.append(wj[a * sh + p, b * sw + q])
    wmat = jnp.stack(wrows)  # (n_taps, C)

    n_rows = oh * wph        # over-wide output rows per image
    maxoff = (khp - 1) * wph + (kwp - 1)
    mchunk = 512
    n_rows_p = _round_up(n_rows, mchunk)
    fhx = _round_up(n_rows_p + max(maxoff, 1), 32)

    c_p = _round_up(c, 128)
    bc = 128
    xflat = xr.reshape(n, pnum, hph * wph, c)
    xflat = jnp.pad(
        xflat, ((0, 0), (0, 0), (0, fhx - hph * wph), (0, c_p - c)))
    wmat = jnp.pad(wmat, ((0, 0), (0, c_p - c)))
    pad1 = lambda a, cv=0: jnp.pad(
        a, (0, c_p - cout), constant_values=cv).reshape(1, c_p)

    rq_mode, mx = _pack_rq(m_arr, s_arr, out_zp, qmin, qmax, rounding,
                           cout, c_p)
    m1 = jnp.asarray(mx) if rq_mode else pad1(m_arr, 1)
    fn = _build_flat_dw(
        n, pnum, fhx, c_p, n_rows, n_rows_p, len(taps), bc, mchunk,
        tuple(taps), wph, int(out_zp), rounding, qmin, qmax, out_dtype,
        shift_values, interp, rq_mode=rq_mode)
    with _x32_tracing():
        out = fn(xflat, wmat, pad1(bias_arr), m1, pad1(s_arr))
    out = out[:, :n_rows].reshape(n, oh, wph, c_p)
    return out[:, :, :ow, :cout]


def flat_conv_workload(n, h, w, cin, cout, kh, kw, strides, fuse,
                       groups: int = 1) -> str:
    sh, sw = strides
    g = f"_G{groups}" if groups != 1 else ""
    return (f"qconv2d_flat/N{n}_H{h}_W{w}_C{cin}_O{cout}_K{kh}x{kw}"
            f"_S{sh}x{sw}{g}{'_rq' if fuse else ''}")


# ---------------------------------------------------------------------------
# Frame-chained convolutions (the AlterOpLayout/NCHWc discipline, TPU form)
# ---------------------------------------------------------------------------
# A chain of stride-1 same-spatial convs exchanges "frames" instead of NHWC
# tensors: the raw over-wide kernel output (lead margin of bm rows + mp rows
# + bm tail rows, cout_p lanes), with every garbage cell (over-wide columns,
# frame-height margin rows, batch tail) masked to the stage's output zero
# point so it doubles as the next stage's padding.  The chain pays the
# NHWC->flat pad once at entry and the flat->NHWC extraction once at exit;
# every intermediate conv runs at raw kernel speed with ZERO relayout
# (the role of the reference's NCHWc layout flow:
# `python/tvm/topi/x86/conv2d_int8.py:136` + AlterOpLayout).

def _flat_conv_kernel_f(x_ref, w_ref, bias_ref, m_ref, s_ref, vmask_ref,
                        o_ref, acc_ref, *,
                        taps: tuple, wph: int, bm: int, pad: int, n_k: int,
                        off_base: int, frame_out: bool, out_zp: int,
                        rounding: str, qmin: int, qmax: int,
                        shift_values: tuple, rq_mode: str | None = None,
                        res_ref=None, res_add: tuple | None = None,
                        mask_zp: int | None = None):
    """Base flat kernel + frame plumbing.

    Frame format: array row a holds frame row g = a - bm (a bm-row lead
    whose cells are masked to out_zp like every other garbage row, so
    downstream stages read real padding bytes with no per-tap masking).
    With frame_out the M grid covers mp + bm rows of SHIFTED outputs and
    every store is unconditional (conditional stores measurably break
    Mosaic's output pipelining); block 0 computes from a clamped window but
    all its rows are masked.  off_base folds the inter-stage coordinate
    shifts: image-in/frame-out = tap - bm; frame-in/frame-out = tap - d;
    frame-in/plain-out = tap + bm - d  (d = pt*wph + pl)."""
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    from .qms32 import fused_requantize, q_multiply_shift_select

    m0 = pl.multiple_of(pl.program_id(0) * bm, bm)
    offs = {(a, b): a * wph + b + off_base for (a, b) in taps}
    # rebase: load the window at the first tap (32-aligned), not at m0 —
    # a full-width window would double the per-cell VMEM traffic.  off_base
    # (hence wbase) is NEGATIVE for frame-out stages (outputs are shifted
    # one block down in the frame coordinate); the clamped start only
    # affects block 0, whose rows are all masked garbage by construction.
    wbase = (min(offs.values()) // 32) * 32 if min(offs.values()) >= 0 \
        else -((-min(offs.values()) + 31) // 32) * 32
    offs = {k: v - wbase for k, v in offs.items()}
    start = m0 + wbase
    if wbase < 0:
        start = pl.multiple_of(jnp.maximum(start, 0), 32)
    win = x_ref[pl.ds(start, bm + pad), :]
    bkc = win.shape[-1]
    wlen = bm + pad - 4
    wins = {}
    for r in sorted({o % 4 for o in offs.values()}):
        wins[r] = lax.slice(win, (r, 0), (r + wlen, bkc))
    part = None
    for (a, b) in taps:
        off = offs[(a, b)]
        r = off % 4
        patch = lax.slice(wins[r], (off - r, 0), (off - r + bm, bkc))
        d = jnp.dot(patch, w_ref[a, b], preferred_element_type=jnp.int32)
        part = d if part is None else part + d

    def _finish(acc):
        acc = acc + bias_ref[...]
        v = fused_requantize(acc, m_ref[...], s_ref[...], shift_values,
                             rounding, out_zp, qmin, qmax, rq_mode)
        if res_add is not None:
            # fused qnn.add epilogue (the reference tachikoma runtime's
            # conv "sum" post-op, tachikoma_json_runtime.cc:292-388):
            # requantize BOTH sides to the add's output params exactly as
            # ops/qnn.py _qadd_like, then add, subtract zo, clip
            (l_skip, lm, ls, lzp, r_skip, rm, rs, rzp, zo, lo2, hi2,
             add_rounding) = res_add
            if l_skip:
                ql = v
            else:
                ql = q_multiply_shift_select(
                    v - jnp.int32(lzp), jnp.int32(lm), jnp.int32(ls),
                    (int(ls),), add_rounding) + jnp.int32(zo)
            r = res_ref[...].astype(jnp.int32)
            if r_skip:
                qr = r
            else:
                qr = q_multiply_shift_select(
                    r - jnp.int32(rzp), jnp.int32(rm), jnp.int32(rs),
                    (int(rs),), add_rounding) + jnp.int32(zo)
            v = jnp.clip(ql + qr - jnp.int32(zo),
                         jnp.int32(lo2), jnp.int32(hi2))
        if frame_out:
            # masked rows become the VALUE's zero point so downstream taps
            # read real padding bytes — for res_add stages that is the
            # ADD's output zp, not the conv's
            mz = out_zp if mask_zp is None else mask_zp
            v = jnp.where(vmask_ref[...] != 0, v, jnp.int32(mz))
        o_ref[...] = v.astype(o_ref.dtype)

    kid = pl.program_id(2)
    if n_k == 1:
        _finish(part)
    else:
        @pl.when(kid == 0)
        def _first():
            acc_ref[...] = part

        @pl.when((kid > 0) & (kid < n_k - 1))
        def _mid():
            acc_ref[...] += part

        @pl.when(kid == n_k - 1)
        def _epilogue():
            _finish(acc_ref[...] + part)


@functools.lru_cache(maxsize=None)
def _build_flat_conv_frame(mp, fhx_in, cin_p, cout_p, khp, kwp, wph,
                           bm, bn, bk, wslack, off_base,
                           frame_out, out_zp, rounding, qmin, qmax,
                           out_dtype, shift_values, interpret,
                           res_add: tuple | None = None, rq_mode=None,
                           mask_zp: int | None = None):
    """One chain stage: x (fhx_in, cin_p) int8 -> out int8, either a frame
    (mp + 2*bm rows: out_zp lead margin + mp computed rows + unwritten
    tail) or a plain (mp, cout_p) block."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_k = cin_p // bk
    # frame outputs are block-shifted: the grid covers mp + bm SHIFTED rows
    grid_m = (mp + bm if frame_out else mp) // bm
    grid = (grid_m, cout_p // bn, n_k)
    taps = tuple((a, b) for a in range(khp) for b in range(kwp))
    base = functools.partial(
        _flat_conv_kernel_f,
        taps=taps, wph=wph, bm=bm, pad=wslack, n_k=n_k,
        off_base=off_base, frame_out=frame_out,
        out_zp=out_zp, rounding=rounding, qmin=qmin, qmax=qmax,
        shift_values=shift_values, rq_mode=rq_mode, res_add=res_add,
        mask_zp=mask_zp,
    )
    if res_add is not None:
        def kernel(x, w, b, m, sr, vm, res, o, acc):
            base(x, w, b, m, sr, vm, o, acc, res_ref=res)
    else:
        kernel = base
    kw_extra = {}
    if not interpret:
        kw_extra["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
        kw_extra["cost_estimate"] = pl.CostEstimate(
            flops=2 * mp * cout_p * khp * kwp * cin_p,
            bytes_accessed=fhx_in * cin_p + khp * kwp * cin_p * cout_p
            + mp * cout_p,
            transcendentals=0,
        )
    out_rows = mp + 2 * bm if frame_out else mp
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, cout_p),
                                       jnp.dtype(out_dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((fhx_in, bk), lambda i, j, k: (0, k)),
                pl.BlockSpec((khp, kwp, bk, bn), lambda i, j, k: (0, 0, k, j)),
                pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
                pl.BlockSpec(
                    (4 if rq_mode in ("clamp16", "clamp11") else 1, bn),
                    lambda i, j, k: (0, j)),
                pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
                # validity vector replicated to bn lanes (sub-128-lane
                # blocks wedge the Mosaic compiler); for frame_out the
                # array carries a bm-row lead so block i aligns with the
                # shifted output rows
                pl.BlockSpec((bm, bn), lambda i, j, k: (i, 0)),
            ] + ([pl.BlockSpec((bm, bn), lambda i, j, k: (i, j))]
                 if res_add is not None else []),
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        ),
        interpret=interpret,
        **kw_extra,
    )
    return jax.jit(fn)


def chain_frame_geometry(n, h, w, stages, bm=512):
    """Shared frame geometry for a conv chain: returns (wph, hp, fh, mp,
    fhx0, slack0) or None if no frame height fits.  stages = sequence of
    (khp, kwp, pt, pl, pb, pr).

    hp is MINIMAL (the per-image halo only): the window slack past the M
    grid is covered by a flat TAIL pad at chain entry (fhx0 > n*fh rows),
    not by inflating every image's frame height.  The old tight-geometry
    loop coupled the inter-image stride to the buffer length, so each +1 hp
    step added n*wph rows of supply but (n-1)*wph rows of need — hp ran
    from 58 to 66 at the 8x56x56 headline (interior stages computed 31744
    rows for 25088 useful, 79%) and from 30 to 47 at b32 H28.  Tail rows
    are read only by tap windows of masked (invalid) output rows, so their
    VALUE is arbitrary; they just have to exist."""
    max_kh = max(s[0] for s in stages)
    max_kw = max(s[1] for s in stages)
    max_top = max(s[2] for s in stages)
    max_bot = max(s[4] for s in stages)
    wph = _round_up(w + max_kw - 1, 4)
    hp = h + max(max_top, max_bot, max_kh - 1)
    fh = hp * wph
    maxoff = (max_kh - 1) * wph + (max_kw - 1)
    slack0 = _round_up(maxoff + 4, 32)
    # margin makes the grid COMPUTE (and zp-mask) the bottom rows that
    # downstream stages' taps read past the last valid output
    margin = (max_kh - 1) * wph + max_kw
    need = (n - 1) * fh + h * wph + margin
    mp = _round_up(need, bm)
    fhx0 = max(n * fh, mp + slack0)
    return wph, hp, fh, mp, fhx0, slack0


def chain_fits_vmem(n, h, w, geo_stages) -> bool:
    """Can the frame-chain executor hold this geometry's x window in VMEM
    at the NARROWEST K block?  The frame kernel keeps the whole flat image
    resident as a (rows, bk) block (double-buffered).  Margin assumes the
    largest tuned bm (2048)."""
    geo = chain_frame_geometry(n, h, w, geo_stages, 512)
    if geo is None:
        return False
    _, _, _, mp, _, _ = geo
    return 2 * (mp + 2 * 2048) * 128 <= _VMEM_BUDGET


def _bk_pref(ci_p: int) -> int:
    for cand in (512, 256, 128):
        if cand <= ci_p and ci_p % cand == 0:
            return cand
    return 128


def chain_batch_split(n, h, w, geo_stages, ci_list=None,
                      bm: int = 512) -> int | None:
    """Largest divisor nb of n whose frame window fits VMEM *at the chain's
    PREFERRED K block* — large batches run the SAME chain kernels over n/nb
    sub-batches under lax.map, keeping the small-batch per-image cost.

    Preferring the deep K block over merely fitting matters: a b32 H14
    C1024 chain 'fits' at bk=128 but then pays 8 sequential k-block passes
    plus 3x frame-row inflation — measured 28.2 ms for ResNet-50 b32
    stage3 vs ~2.7 ms expected (scripts/ablate_resnet.py).  Only when no
    sub-batch supports the preferred block does the relaxed bk=128 window
    qualify a size.

    bm is the chain's RESOLVED block size (tuned or default): sizing the
    window at the actual bm instead of a 2048 worst case keeps sub-batches
    as large as the real kernels allow."""
    if ci_list:
        bk_want = max(_bk_pref(_round_up(int(c), 128)) for c in ci_list)
    else:
        bk_want = 512
    for bk in (bk_want, 128):
        nb = n
        while nb >= 1:
            geo = chain_frame_geometry(nb, h, w, geo_stages, bm)
            if geo is not None:
                mp = geo[3]
                if 2 * (mp + 2 * bm) * bk <= _VMEM_BUDGET:
                    return nb
            nb -= 1
            while nb >= 1 and n % nb:
                nb -= 1
    return None


def _wpack2_cost(ci: int, co: int) -> tuple[int, int]:
    """(packed, unpacked) per-tap padded MAC cost of width-packing by 2.

    Packing keeps the tap COUNT (kw' == kw for kw in {1, 3}) and halves the
    output positions while doubling both channel dims, so per original
    output position the padded cost goes roundup(ci)*roundup(co) ->
    roundup(2ci)*roundup(2co)/2."""
    up = _round_up(ci, 128) * _round_up(co, 128)
    pk = _round_up(2 * ci, 128) * _round_up(2 * co, 128) // 2
    return pk, up


def _chain_wpack2_structural(wd: int, stages) -> bool:
    """Structural legality of width-packing by 2: even W, every stage
    kw in {1, 3} with symmetric width padding (kh is untouched — packing
    acts on W only), and no stage with a HIGHER packed MAC cost.  This is
    the bar `wpack=True` (force) must clear; auto mode additionally
    requires a strict gain (`_chain_wpack2_eligible`)."""
    if wd % 2:
        return False
    for st in stages:
        kh, kw_, ci, co = st["w"].shape
        _, pl_, _, pr = st.get("padding", (0, 0, 0, 0))
        if kw_ not in (1, 3) or pl_ != (kw_ - 1) // 2 or pr != pl_:
            return False
        pk, up = _wpack2_cost(ci, co)
        if pk > up:
            return False
    return True


def _chain_wpack2_eligible(wd: int, stages) -> bool:
    """Width-pack-by-2 a chain of narrow-channel convs: (N,H,W,C) is viewed
    as (N,H,W/2,2C) — a FREE reshape in NHWC — and every stage becomes a
    same-kw conv over the packed image with block-structured weights.  Sub-
    128-channel stages pad to the 128-lane MXU granularity (a C64 3x3 wastes
    4x MACs — the measured 20-31 TOPS vs 144-181 for C128 chains); packing
    moves them to the native 128 granularity at HALF the positions, an exact
    2x padded-MAC reduction (the reference's NCHWc schedules attack the same
    channel-granularity waste by layout, topi/x86/conv2d_int8.py).

    Eligible iff structurally legal AND at least one stage strictly gains."""
    return _chain_wpack2_structural(wd, stages) and any(
        _wpack2_cost(st["w"].shape[2], st["w"].shape[3])[0]
        < _wpack2_cost(st["w"].shape[2], st["w"].shape[3])[1]
        for st in stages)


def _wpack2_feasible(n, h, wd, stages, bn_cap, bm) -> bool:
    """Packed chains quadruple the per-stage weight VMEM term (both channel
    dims double), so an eligible packing can fit NO frame geometry at any
    sub-batch where the unpacked chain runs fine.  Probe the packed batch
    split + exact per-stage VMEM fit on shape-only stand-ins BEFORE
    committing to the packed rewrite, and fall back to the unpacked path
    when it fails (round-4 advisor finding: the old path asserted)."""
    from types import SimpleNamespace

    probe, geo_stages = [], []
    for st in stages:
        kh, kw_, ci, co = st["w"].shape
        pad = tuple(st.get("padding", (0, 0, 0, 0)))
        probe.append({"w": SimpleNamespace(shape=(kh, kw_, 2 * ci, 2 * co)),
                      "padding": pad})
        geo_stages.append((kh, kw_) + pad)
    nb = chain_batch_split(n, h, wd // 2, geo_stages,
                           ci_list=[2 * st["w"].shape[2] for st in stages],
                           bm=bm)
    while nb is not None and not _chain_stages_feasible(
            nb, h, wd // 2, probe, bn_cap, geo_stages, bm=bm):
        nxt = nb - 1
        while nxt >= 1 and n % nxt:
            nxt -= 1
        nb = nxt if nxt >= 1 else None
    return nb is not None


def _wpack2_stage(st: dict) -> dict:
    """Rewrite one chain stage for the width-packed image.

    Packed input channel block s holds source column 2j+s; packed output
    block s' holds output column 2j+s'.  Output col 2j+s' taps source col
    2j+s'+dx for dx in [-pl, pl], which lives in packed column j+q, block
    s_in, with q = floor((s'+dx)/2), s_in = (s'+dx) mod 2 — so each
    original tap scatters into a (ci x co) sub-block of a packed tap, and
    every other sub-block is ZERO (pad columns the original never read are
    multiplied by these zero blocks, keeping izp folding and padding
    semantics exact).  Per-channel params tile x2 (block s' carries the
    same channels in the same order).

    Weights/bias may be TRACED arrays (the executor feeds them as jit
    params), so the rewrite uses jnp with static slices; multiplier/shift
    are always host-side (the chain derives host control flow from them)."""
    import jax.numpy as jnp

    w = st["w"]
    kh, kw_, ci, co = w.shape
    pl_ = (kw_ - 1) // 2
    wp = jnp.zeros((kh, kw_, 2 * ci, 2 * co), w.dtype)
    for s_out in (0, 1):
        for d in range(kw_):
            idx = s_out + d - pl_
            q, s_in = idx // 2, idx % 2
            wp = wp.at[:, q + pl_, s_in * ci:(s_in + 1) * ci,
                       s_out * co:(s_out + 1) * co].set(w[:, d])
    st2 = dict(st)
    st2["w"] = wp
    if st.get("bias") is not None:
        st2["bias"] = jnp.tile(jnp.asarray(st["bias"]), 2)
    for key in ("multiplier", "shift"):
        v = np.asarray(st[key])
        if v.ndim:
            st2[key] = np.tile(v, 2)
    return st2


def _chain_stages_feasible(n, h, wd, stages, bn_cap, geo_stages,
                           bm: int = 2048) -> bool:
    """EXACT per-stage VMEM feasibility at the chain's resolved bm: the
    split heuristic (chain_batch_split) omits the weight/acc/out terms, so
    a boundary geometry could pass the split yet have no runnable bk —
    this check closes that gap before any kernel is built."""
    geo = chain_frame_geometry(n, h, wd, geo_stages, bm)
    if geo is None:
        return False
    _, _, fh, mp, fhx0, _ = geo
    cur_rows = fhx0
    for si, st in enumerate(stages):
        kh, kw_, ci, co = st["w"].shape
        ci_p = _round_up(ci, 128)
        co_p = _round_up(co, 128)
        bn = max(d for d in (512, 256, 128)
                 if d <= min(int(bn_cap), co_p) and co_p % d == 0)
        ok = any(
            2 * cur_rows * c + 2 * kh * kw_ * c * bn + bm * bn * 4
            + 2 * bm * bn <= _VMEM_BUDGET
            for c in (512, 256, 128) if c <= ci_p and ci_p % c == 0)
        if not ok:
            return False
        cur_rows = mp + 2 * bm
    return True


def qconv2d_flat_chain(x, stages, *, bm=None, bn_cap=128, interpret=None,
                       residual=None, res_params: dict | None = None,
                       wpack: bool | None = None):
    """Run a chain of stride-1, same-spatial-size, fused-requantize convs
    through frame-resident Pallas kernels.

    x: (N, H, W, CIN) int8.  Each stage is a dict with keys:
      w (KH,KW,CIN,COUT) int8, bias (COUT,) int32 or None,
      multiplier / shift (scalar or per-channel), izp, out_zp,
      rounding, qmin, qmax, padding (pt, pl, pb, pr) with SAME spatial
      output (OH == H, OW == W).
    Returns (N, H, W, COUT_last) int8.

    residual/res_params: fused qnn.add epilogue on the LAST stage (the
    reference's conv "sum" post-op): residual (N,H,W,COUT_last) int8 is
    requantized and added in-register before the single int8 store —
    the chain output never round-trips HBM.  res_params carries the
    qnn.add attrs: lhs_scale/lhs_zero_point (the chain output's qparams),
    rhs_scale/rhs_zero_point, output_scale/output_zero_point,
    rounding, a_min, a_max.  Exact: bit-identical to chain -> qnn.add.
    """
    import jax.numpy as jnp
    from jax import lax

    if interpret is None:
        interpret = _interpret_default()
    n, h, wd, cin = x.shape
    # caller-supplied blocks must survive the packed-record lookup below —
    # tuner trials pass explicit bm/bn and must measure THAT config, not a
    # committed DB record (round-4 advisor finding)
    bm_explicit = bm is not None
    if bm is None:
        # tuned chain geometry first (tune_conv_chain records {bm[, bn]})
        from ...tune.database import lookup_config

        dims = [(st["w"].shape[0], st["w"].shape[2], st["w"].shape[3])
                for st in stages]
        cfg = lookup_config(chain_workload(n, h, wd, dims))
        if cfg and "bm" in cfg:
            bm = int(cfg["bm"])
            if "bn" in cfg:
                bn_cap = int(cfg["bn"])
        else:
            # measured on v5e: smaller blocks at small spatial extents LOSE
            # more to per-dot inefficiency than they save in lead/tail margin
            # rows (auto-shrinking to 256/128 cost ResNet-50 ~1.2 ms e2e)
            bm = 512
    if wpack is True and not _chain_wpack2_structural(wd, stages):
        raise ValueError(
            "wpack=True on an ineligible chain: width-packing needs even W,"
            " every stage kw in {1,3} with symmetric width padding, and no"
            " stage with a higher packed MAC cost")
    if wpack is True or (wpack is None and _chain_wpack2_eligible(wd, stages)
                         and os.environ.get("TK_NO_WPACK") != "1"):
        # width-pack by 2: free NHWC reshapes at entry/exit, 2x fewer padded
        # MACs for sub-128-channel stages (see _chain_wpack2_eligible)
        bm_p, bn_p = bm, bn_cap
        if not bm_explicit:
            # a tuned record for the PACKED geometry overrides the unpacked
            # bm/bn resolved above (a row-block size is geometry-agnostic,
            # so the unpacked pick is a sane fallback)
            from ...tune.database import lookup_config as _lk

            dims_p = [(st["w"].shape[0], 2 * st["w"].shape[2],
                       2 * st["w"].shape[3]) for st in stages]
            cfgp = _lk(chain_workload(n, h, wd // 2, dims_p))
            if cfgp and "bm" in cfgp:
                bm_p = int(cfgp["bm"])
                if "bn" in cfgp:
                    bn_p = int(cfgp["bn"])
        if _wpack2_feasible(n, h, wd, stages, bn_p, bm_p):
            ps = [_wpack2_stage(st) for st in stages]
            co_last = stages[-1]["w"].shape[3]
            rp = None
            if residual is not None:
                rp = jnp.asarray(residual).reshape(n, h, wd // 2,
                                                   2 * co_last)
            out = qconv2d_flat_chain(
                x.reshape(n, h, wd // 2, 2 * cin), ps, bm=bm_p,
                bn_cap=bn_p, interpret=interpret, residual=rp,
                res_params=res_params, wpack=False)
            return out.reshape(n, h, wd, co_last)
        if wpack is True:
            raise ValueError(
                "wpack=True but the packed chain fits no frame geometry at"
                " any sub-batch (the doubled-channel VMEM terms do not fit)")
        # infeasible packing: fall through to the unpacked path
    geo_stages = []
    for st in stages:
        kh, kw_, ci, co = st["w"].shape
        pt, pl_, pb, pr = st.get("padding", (0, 0, 0, 0))
        oh = h + pt + pb - kh + 1
        ow = wd + pl_ + pr - kw_ + 1
        assert (oh, ow) == (h, wd), "chain stages must preserve spatial size"
        geo_stages.append((kh, kw_, pt, pl_, pb, pr))
    for prev, nxt in zip(stages, stages[1:]):
        assert int(nxt.get("izp", 0)) == int(prev.get("out_zp", 0)), \
            "chain stages must agree on zero points (izp == producer out_zp)"

    # large-batch split: run the fitting sub-batch size under lax.map —
    # same kernels, same per-image cost, any batch (chain_batch_split);
    # then verify EXACT per-stage feasibility and split further if the
    # heuristic's margin was too thin
    nb = chain_batch_split(n, h, wd, geo_stages,
                           ci_list=[st["w"].shape[2] for st in stages],
                           bm=bm)
    while nb is not None and not _chain_stages_feasible(
            nb, h, wd, stages, bn_cap, geo_stages, bm=bm):
        nxt = nb - 1
        while nxt >= 1 and n % nxt:
            nxt -= 1
        nb = nxt if nxt >= 1 else None
    assert nb is not None, "no frame geometry fits this chain at any batch"
    if nb < n:
        from jax import lax as _lax

        def one(args):
            xi, ri = args
            return qconv2d_flat_chain(
                xi, stages, bm=bm, bn_cap=bn_cap, interpret=interpret,
                residual=ri if residual is not None else None,
                res_params=res_params)

        xg = x.reshape(n // nb, nb, h, wd, cin)
        rg = (jnp.asarray(residual).reshape(n // nb, nb, h, wd, -1)
              if residual is not None else jnp.zeros((n // nb, 1),
                                                     jnp.int8))
        out = _lax.map(one, (xg, rg))
        return out.reshape(n, h, wd, out.shape[-1])

    geo = chain_frame_geometry(n, h, wd, geo_stages, bm)
    assert geo is not None, "no frame geometry fits this chain"
    wph, hp, fh, mp, fhx0, slack0 = geo

    # validity vector: frame row -> 1 if (y < h) & (x < w) & inside batch;
    # replicated to 128 lanes (1-lane blocks wedge the Mosaic compiler)
    rows = np.arange(mp, dtype=np.int64)
    p = rows % fh
    valid = ((p // wph) < h) & ((p % wph) < wd) & (rows < n * fh)
    bn_cap = int(bn_cap)
    vm = np.broadcast_to(valid.astype(np.int8).reshape(mp, 1), (mp, bn_cap))
    vmask_plain = jnp.asarray(vm)
    # frame stages' outputs are shifted one block down: prepend a lead
    # block so vmask block i aligns with output block i
    vmask_frame = jnp.asarray(
        np.concatenate([np.zeros((bm, bn_cap), np.int8), vm]))

    # entry: one pad builds the flat image
    st0 = stages[0]
    pt, pl_, pb, pr = st0.get("padding", (0, 0, 0, 0))
    izp0 = int(st0.get("izp", 0))
    cin_p = _round_up(cin, 128)
    xpad = jnp.pad(
        x, ((0, 0), (pt, hp - h - pt), (pl_, wph - wd - pl_),
            (0, cin_p - cin)),
        constant_values=np.int8(izp0))
    cur = xpad.reshape(n * fh, cin_p)
    if fhx0 > n * fh:
        # window-slack tail (see chain_frame_geometry): rows past n*fh are
        # only ever read by tap windows of masked output rows — value-free
        cur = jnp.pad(cur, ((0, fhx0 - n * fh), (0, 0)),
                      constant_values=np.int8(izp0))
    cur_rows = fhx0
    cur_lead = 0          # stage-0 input has no lead margin and is pre-padded

    last = len(stages) - 1
    for si, st in enumerate(stages):
        kh, kw_, ci, co = st["w"].shape
        pt, pl_, pb, pr = st.get("padding", (0, 0, 0, 0))
        izp = int(st.get("izp", 0))
        ci_p = _round_up(ci, 128)
        co_p = _round_up(co, 128)
        wfull = jnp.pad(jnp.asarray(st["w"]),
                        ((0, 0), (0, 0), (0, ci_p - ci), (0, co_p - co)))
        bias = (jnp.zeros((co,), jnp.int32) if st.get("bias") is None
                else jnp.asarray(st["bias"], jnp.int32))
        if izp:
            colsum = jnp.sum(jnp.asarray(st["w"], jnp.int32), axis=(0, 1, 2))
            bias = bias - jnp.int32(izp) * colsum
        m_arr = np.ascontiguousarray(np.broadcast_to(
            np.asarray(st["multiplier"], np.int32), (co,)))
        s_arr = np.ascontiguousarray(np.broadcast_to(
            np.asarray(st["shift"], np.int32), (co,)))
        shift_values = tuple(sorted({int(v) for v in s_arr}))
        pad1 = lambda a, cv=0: jnp.pad(
            jnp.asarray(a), (0, co_p - co),
            constant_values=cv).reshape(1, co_p)
        rq_mode, mx = _pack_rq(m_arr, s_arr, int(st.get("out_zp", 0)),
                               int(st.get("qmin", -128)),
                               int(st.get("qmax", 127)),
                               st.get("rounding", "UPWARD"), co, co_p)
        b1, s1 = pad1(bias), pad1(s_arr)
        m1 = jnp.asarray(mx) if rq_mode else pad1(m_arr, 1)

        # coordinate shifts (see _flat_conv_kernel_f docstring): frames
        # store row g at array row g + bm; pre-padded entry images have no
        # shift and their pad already encodes the borders
        out_frame = si != last
        in_shift, d_in = (bm, pt * wph + pl_) if cur_lead else (0, 0)
        out_shift = bm if out_frame else 0
        off_base = in_shift - d_in - out_shift
        # the kernel rebases its window at the first tap (32-aligned), so
        # the slack only spans the tap RANGE
        maxoff = (kh - 1) * wph + (kw_ - 1) + off_base
        wbase = (off_base // 32) * 32
        wslack = _round_up(max(maxoff - wbase, 1) + 4, 32)
        # window containment (max read = m0_max + wbase + bm + wslack)
        m0_max = mp if out_frame else mp - bm
        assert m0_max + wbase + bm + wslack <= cur_rows, \
            "window overruns the frame"

        bn = max(d for d in (512, 256, 128)
                 if d <= min(bn_cap, co_p) and co_p % d == 0)
        # VMEM-aware K block: the frame kernel holds a (cur_rows, bk) x
        # window (double-buffered by Pallas even at a constant index) — at
        # large batches 512-deep blocks exceed the scoped VMEM limit
        # (observed: b32 H14 chain, 2 x 25600 x 512 = 25.1 MB vs 16 MB)
        bk = None
        for cand in (512, 256, 128):
            if cand > ci_p or ci_p % cand:
                continue
            vm = (2 * cur_rows * cand + 2 * kh * kw_ * cand * bn
                  + bm * bn * 4 + 2 * bm * bn)
            if vm <= _VMEM_BUDGET:
                bk = cand
                break
        assert bk is not None, \
            f"chain window {cur_rows} rows exceeds VMEM even at bk=128 " \
            "(fuse_conv_chains should not have built this chain)"
        res_add = None
        res_flat = None
        if si == last and residual is not None:
            rp = dict(res_params)
            from .qms32 import plan_requantize as _plan

            so = float(rp["output_scale"])
            zo = int(rp.get("output_zero_point", 0))
            sc = float(rp["lhs_scale"])
            zc = int(rp.get("lhs_zero_point", 0))
            sr = float(rp["rhs_scale"])
            zr = int(rp.get("rhs_zero_point", 0))
            l_skip = (sc == so and zc == zo)
            r_skip = (sr == so and zr == zo)
            lm, ls = (0, 0) if l_skip else _plan(sc, so)
            rm, rs = (0, 0) if r_skip else _plan(sr, so)
            info8 = (-128, 127)
            lo2 = max(int(rp.get("a_min", info8[0])), info8[0])
            hi2 = min(int(rp.get("a_max", info8[1])), info8[1])
            res_add = (l_skip, int(lm), int(ls), zc, r_skip, int(rm),
                       int(rs), zr, zo, lo2, hi2,
                       rp.get("rounding", "UPWARD"))
            # residual in the same flat geometry as the (plain) output
            rpad = jnp.pad(
                jnp.asarray(residual),
                ((0, 0), (0, hp - h), (0, wph - wd), (0, co_p - co)),
                constant_values=np.int8(zr))
            res_flat = rpad.reshape(n * fh, co_p)
            if res_flat.shape[0] < mp:
                res_flat = jnp.pad(res_flat,
                                   ((0, mp - res_flat.shape[0]), (0, 0)))
        fn = _build_flat_conv_frame(
            mp, cur_rows, ci_p, co_p, kh, kw_, wph, bm, bn, bk, wslack,
            off_base, out_frame, int(st.get("out_zp", 0)),
            st.get("rounding", "UPWARD"), int(st.get("qmin", -128)),
            int(st.get("qmax", 127)), "int8", shift_values, interpret,
            res_add=res_add, rq_mode=rq_mode)
        with _x32_tracing():
            if res_add is not None:
                cur = fn(cur, wfull, b1, m1, s1, vmask_plain, res_flat)
            else:
                cur = fn(cur, wfull, b1, m1, s1,
                         vmask_frame if out_frame else vmask_plain)
        if si != last:
            cur_rows = mp + 2 * bm
            cur_lead = bm
        else:
            rows_img = h * wph
            imgs = [lax.slice(cur, (i * fh, 0), (i * fh + rows_img, co_p))
                    for i in range(n)]
            out4 = jnp.stack(imgs).reshape(n, h, wph, co_p)
            return out4[:, :, :wd, :co]


def chain_workload(n, h, w, stage_dims) -> str:
    """Tune-DB key for a conv chain: stage_dims = [(kh, cin, cout), ...]."""
    stages = "+".join(f"K{kh}C{ci}O{co}" for (kh, ci, co) in stage_dims)
    return f"qconv2d_chain/N{n}_H{h}_W{w}/{stages}"


def stack_workload(n, h, w, block_dims) -> str:
    """Tune-DB key for a residual-block stack: block_dims =
    [[(kh, cin, cout), ...] per block]."""
    blocks = "|".join("+".join(f"K{kh}C{ci}O{co}" for (kh, ci, co) in b)
                      for b in block_dims)
    return f"qconv2d_stack/N{n}_H{h}_W{w}/{blocks}"


def _stack_wpack2(blocks):
    """Width-packability of a whole block stack: every stage of every
    block must be structurally legal and at least one must strictly gain
    (see _chain_wpack2_eligible)."""
    stages = [st for (sts, _) in blocks for st in sts]
    return stages


def qconv2d_flat_block_stack(x, blocks, *, bm=None, bn_cap=128,
                             interpret=None, wpack: bool | None = None):
    """Run a STACK of identity-residual conv blocks stage-persistently:
    activations stay in the flat frame layout across every block — the
    entry pad and exit extract are paid ONCE for the whole stack, and each
    block's residual add reads the block's input frame in-register (no
    NHWC round trip anywhere inside the stack).

    blocks: [(stages, res_params | None)] — `stages` as in
    qconv2d_flat_chain; when res_params is given the block computes
    qnn.add(chain(x), x) fused into its last stage (the IDENTITY residual:
    the rhs is the block's own input, which for chained ResNet blocks is
    the previous block's output — so the whole stack is closed over frame
    buffers).  Every block must preserve (H, W) and, when residual, have
    cout == cin.

    Design (round-5 verdict item 1, "stage-persistent layouts"): frame
    outputs are zp-MASKED at invalid rows (_flat_conv_kernel_f), so a
    frame buffer IS a correctly padded flat image for the next conv — the
    per-block entry/exit of the chain path was pure overhead.  The entry
    here is built directly in frame coordinates (pixel (y,x) of image i at
    row bm + i*fh + y*wph + x, izp-filled borders and lead margin), every
    stage runs frame-in/frame-out, and only the stack's final stage emits
    the plain layout for the one exit extract.  Reference analog: the
    whole-graph layout discipline of AlterOpLayout + NCHWc int8
    (src/relay/transforms/alter_op_layout.cc,
    python/tvm/topi/x86/conv2d_int8.py)."""
    import jax.numpy as jnp
    from jax import lax

    if interpret is None:
        interpret = _interpret_default()
    n, h, wd, cin = x.shape
    bm_explicit = bm is not None
    all_stages = [st for (sts, _) in blocks for st in sts]
    if bm is None:
        from ...tune.database import lookup_config

        bdims = [[(st["w"].shape[0], st["w"].shape[2], st["w"].shape[3])
                  for st in sts] for (sts, _) in blocks]
        cfg = lookup_config(stack_workload(n, h, wd, bdims))
        if not (cfg and "bm" in cfg):
            # fall back to the first block's chain record (same geometry)
            cfg = lookup_config(chain_workload(n, h, wd, bdims[0]))
        if cfg and "bm" in cfg:
            bm = int(cfg["bm"])
            if "bn" in cfg:
                bn_cap = int(cfg["bn"])
            # measured (round 5, 56^2 C256/m64 stack): width-packing HURTS
            # stacks where bn=512 is available unpacked — packing doubles
            # channels, shrinking bk under VMEM and capping bn; the tuner
            # records the arbitration as a per-workload "wpack" flag
            if wpack is None and "wpack" in cfg:
                wpack = bool(cfg["wpack"])
        else:
            bm = 512
    # width-packing: pack every block's stages; identity residuals ride the
    # same free reshape
    if ((wpack is True and _chain_wpack2_structural(wd, all_stages))
            or (wpack is None and _chain_wpack2_eligible(wd, all_stages)
                and os.environ.get("TK_NO_WPACK") != "1")) \
            and _wpack2_feasible(n, h, wd, all_stages, bn_cap, bm):
        pb = [([_wpack2_stage(st) for st in sts], rp)
              for (sts, rp) in blocks]
        co_last = blocks[-1][0][-1]["w"].shape[3]
        out = qconv2d_flat_block_stack(
            x.reshape(n, h, wd // 2, 2 * cin), pb, bm=bm, bn_cap=bn_cap,
            interpret=interpret, wpack=False)
        return out.reshape(n, h, wd, co_last)

    geo_stages = []
    for st in all_stages:
        kh, kw_, ci, co = st["w"].shape
        pt, pl_, pb_, pr = st.get("padding", (0, 0, 0, 0))
        assert (h + pt + pb_ - kh + 1, wd + pl_ + pr - kw_ + 1) == (h, wd), \
            "stack stages must preserve spatial size"
        geo_stages.append((kh, kw_, pt, pl_, pb_, pr))
    for (sts, rp) in blocks:
        if rp is not None:
            assert sts[0]["w"].shape[2] == sts[-1]["w"].shape[3], \
                "identity-residual block needs cout == cin"
    # zero-point agreement along the data path: stage i+1's izp must be the
    # producer's out_zp; block boundaries compare against the res_add
    # output zp (or the last stage's when no residual)
    prev_zp = None
    for (sts, rp) in blocks:
        for st in sts:
            if prev_zp is not None:
                assert int(st.get("izp", 0)) == prev_zp, \
                    "stack zero points must chain (izp == producer zp)"
            prev_zp = int(st.get("out_zp", 0))
        if rp is not None:
            prev_zp = int(rp.get("output_zero_point", 0))

    # batch split (same discipline as the chain path)
    nb = chain_batch_split(n, h, wd, geo_stages,
                           ci_list=[st["w"].shape[2] for st in all_stages],
                           bm=bm)
    while nb is not None and not _chain_stages_feasible(
            nb, h, wd, all_stages, bn_cap, geo_stages, bm=bm):
        nxt = nb - 1
        while nxt >= 1 and n % nxt:
            nxt -= 1
        nb = nxt if nxt >= 1 else None
    assert nb is not None, "no frame geometry fits this stack at any batch"
    if nb < n:
        def one(xi):
            return qconv2d_flat_block_stack(
                xi, blocks, bm=bm, bn_cap=bn_cap, interpret=interpret,
                wpack=False)

        xg = x.reshape(n // nb, nb, h, wd, cin)
        out = lax.map(one, xg)
        return out.reshape(n, h, wd, out.shape[-1])

    geo = chain_frame_geometry(nb, h, wd, geo_stages, bm)
    assert geo is not None
    wph, hp, fh, mp, fhx0, slack0 = geo

    rows = np.arange(mp, dtype=np.int64)
    p = rows % fh
    valid = ((p // wph) < h) & ((p % wph) < wd) & (rows < n * fh)
    bn_cap = int(bn_cap)
    vm = np.broadcast_to(valid.astype(np.int8).reshape(mp, 1), (mp, bn_cap))
    vmask_plain = jnp.asarray(vm)
    vmask_frame = jnp.asarray(
        np.concatenate([np.zeros((bm, bn_cap), np.int8), vm]))

    # entry in FRAME coordinates: no pt/pl offset — borders come from the
    # izp fill exactly where interior frame taps read them (left pad =
    # x >= wd columns of the previous row; top pad = previous image's
    # y >= h rows, or the lead margin for image 0)
    izp0 = int(all_stages[0].get("izp", 0))
    cin_p = _round_up(cin, 128)
    total = mp + 2 * bm
    xpad = jnp.pad(
        x, ((0, 0), (0, hp - h), (0, wph - wd), (0, cin_p - cin)),
        constant_values=np.int8(izp0))
    cur = xpad.reshape(n * fh, cin_p)
    if total >= bm + n * fh:
        cur = jnp.pad(cur, ((bm, total - bm - n * fh), (0, 0)),
                      constant_values=np.int8(izp0))
    else:
        # rows past total are value-free pad rows of the last image
        cur = jnp.pad(cur, ((bm, 0), (0, 0)),
                      constant_values=np.int8(izp0))[:total]

    n_blocks = len(blocks)
    for bi, (sts, rp) in enumerate(blocks):
        block_in = cur
        last = len(sts) - 1
        for si, st in enumerate(sts):
            kh, kw_, ci, co = st["w"].shape
            pt, pl_, pb_, pr = st.get("padding", (0, 0, 0, 0))
            izp = int(st.get("izp", 0))
            ci_p = _round_up(ci, 128)
            co_p = _round_up(co, 128)
            wfull = jnp.pad(jnp.asarray(st["w"]),
                            ((0, 0), (0, 0), (0, ci_p - ci),
                             (0, co_p - co)))
            bias = (jnp.zeros((co,), jnp.int32) if st.get("bias") is None
                    else jnp.asarray(st["bias"], jnp.int32))
            if izp:
                colsum = jnp.sum(jnp.asarray(st["w"], jnp.int32),
                                 axis=(0, 1, 2))
                bias = bias - jnp.int32(izp) * colsum
            m_arr = np.ascontiguousarray(np.broadcast_to(
                np.asarray(st["multiplier"], np.int32), (co,)))
            s_arr = np.ascontiguousarray(np.broadcast_to(
                np.asarray(st["shift"], np.int32), (co,)))
            shift_values = tuple(sorted({int(v) for v in s_arr}))
            pad1 = lambda a, cv=0: jnp.pad(
                jnp.asarray(a), (0, co_p - co),
                constant_values=cv).reshape(1, co_p)
            rq_mode, mx = _pack_rq(m_arr, s_arr, int(st.get("out_zp", 0)),
                                   int(st.get("qmin", -128)),
                                   int(st.get("qmax", 127)),
                                   st.get("rounding", "UPWARD"), co, co_p)
            b1, s1 = pad1(bias), pad1(s_arr)
            m1 = jnp.asarray(mx) if rq_mode else pad1(m_arr, 1)

            out_frame = not (bi == n_blocks - 1 and si == last)
            # every stage is frame-in (the entry is built in frame coords)
            in_shift, d_in = bm, pt * wph + pl_
            out_shift = bm if out_frame else 0
            off_base = in_shift - d_in - out_shift
            maxoff = (kh - 1) * wph + (kw_ - 1) + off_base
            wbase = (off_base // 32) * 32
            wslack = _round_up(max(maxoff - wbase, 1) + 4, 32)
            m0_max = mp if out_frame else mp - bm
            assert m0_max + wbase + bm + wslack <= total, \
                "window overruns the stack frame"

            bn = max(d for d in (512, 256, 128)
                     if d <= min(bn_cap, co_p) and co_p % d == 0)
            bk = None
            for cand in (512, 256, 128):
                if cand > ci_p or ci_p % cand:
                    continue
                vmem = (2 * total * cand + 2 * kh * kw_ * cand * bn
                        + bm * bn * 4 + 2 * bm * bn)
                if vmem <= _VMEM_BUDGET:
                    bk = cand
                    break
            assert bk is not None, "stack stage exceeds VMEM at bk=128"

            res_add = None
            res_flat = None
            if si == last and rp is not None:
                from .qms32 import plan_requantize as _plan

                so = float(rp["output_scale"])
                zo = int(rp.get("output_zero_point", 0))
                sc = float(rp["lhs_scale"])
                zc = int(rp.get("lhs_zero_point", 0))
                sr = float(rp["rhs_scale"])
                zr = int(rp.get("rhs_zero_point", 0))
                l_skip = (sc == so and zc == zo)
                r_skip = (sr == so and zr == zo)
                lm, ls = (0, 0) if l_skip else _plan(sc, so)
                rm, rs = (0, 0) if r_skip else _plan(sr, so)
                lo2 = max(int(rp.get("a_min", -128)), -128)
                hi2 = min(int(rp.get("a_max", 127)), 127)
                res_add = (l_skip, int(lm), int(ls), zc, r_skip, int(rm),
                           int(rs), zr, zo, lo2, hi2,
                           rp.get("rounding", "UPWARD"))
                # the identity residual IS the block's input frame — same
                # row coordinates as the (frame or plain) output blocks
                res_flat = block_in if out_frame else block_in[bm:]

            fn = _build_flat_conv_frame(
                mp, total, ci_p, co_p, kh, kw_, wph, bm, bn, bk, wslack,
                off_base, out_frame, int(st.get("out_zp", 0)),
                st.get("rounding", "UPWARD"), int(st.get("qmin", -128)),
                int(st.get("qmax", 127)), "int8", shift_values, interpret,
                res_add=res_add, rq_mode=rq_mode,
                mask_zp=(int(rp.get("output_zero_point", 0))
                         if res_add is not None else None))
            with _x32_tracing():
                vmask = vmask_frame if out_frame else vmask_plain
                if res_add is not None:
                    cur = fn(cur, wfull, b1, m1, s1, vmask, res_flat)
                else:
                    cur = fn(cur, wfull, b1, m1, s1, vmask)
            if out_frame and cur.shape[0] < total:
                # frame outputs are mp + 2*bm rows already == total
                cur = jnp.pad(cur, ((0, total - cur.shape[0]), (0, 0)))
    # exit: plain output rows are in frame coordinates
    co_p = cur.shape[1]
    co_last = blocks[-1][0][-1]["w"].shape[3]
    rows_img = h * wph
    imgs = [lax.slice(cur, (i * fh, 0), (i * fh + rows_img, co_p))
            for i in range(n)]
    out4 = jnp.stack(imgs).reshape(n, h, wph, co_p)
    return out4[:, :, :wd, :co_last]
