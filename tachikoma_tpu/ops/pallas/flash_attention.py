"""Blockwise (flash-style) attention Pallas kernel — the float path.

SURVEY.md §5.7 names blockwise attention a new design obligation; the
INTEGER path is `ops/qnn.py qnn.attention` (exact LUT softmax, ring-
parallel in parallel/ring_attention.py).  This kernel is its float twin
for the fp32/bf16 benchmark matrix: online-softmax attention computed in
(block_q x block_k) tiles so the (S, S) score matrix never materializes
in HBM.

Shapes: q, k, v (B, H, S, D) -> out (B, H, S, D) float32.  The (B, H)
pair collapses into the leading grid dimension; the key axis is the
sequential ("arbitrary") grid dimension carrying the online-softmax state
(m, l, acc) in VMEM scratch.  TPU notes honored: m/l are (bq, 128) lane-
replicated (sub-128-lane blocks wedge Mosaic), every store unconditional,
masks built from >=128-lane iota.

Causal masking compares global query/key indices; padded keys (S rounded
up to block_k) are masked the same way.
"""

from __future__ import annotations

import functools

import numpy as np

from .matmul_int8 import _interpret_default, _round_up

_NEG_INF = -1e30
_LANES = 128


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
               n_k: int, bq: int, bk: int, scale: float, causal: bool,
               seq_len: int):
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)          # (bq, D)
    k = k_ref[0].astype(jnp.float32)          # (bk, D)
    s = lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
    s = s * jnp.float32(scale)                # (bq, bk)

    # mask padded keys (col >= seq_len) and, if causal, cols > row
    col = ki * bk + lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    mask = col < seq_len
    if causal:
        row = pl.program_id(1) * bq + lax.broadcasted_iota(
            jnp.int32, (bq, bk), 0)
        mask = mask & (col <= row)
    s = jnp.where(mask, s, jnp.float32(_NEG_INF))

    m_prev = m_ref[...]                       # (bq, LANES), lane-replicated
    l_prev = l_ref[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)            # (bq, 1)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    alpha = jnp.exp(m_prev - m_new)                       # (bq, LANES)
    p = jnp.exp(s - m_new[:, :1])                         # (bq, bk)
    l_new = l_prev * alpha + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_prev.shape)
    m_ref[...] = m_new
    l_ref[...] = l_new

    v = v_ref[0].astype(jnp.float32)          # (bk, D)
    pv = jnp.dot(p, v, preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv

    @pl.when(ki == n_k - 1)
    def _finish():
        # rows that saw no unmasked key keep l == 0: emit 0, not NaN
        l = l_ref[:, :1]
        safe = jnp.where(l > 0, l, jnp.float32(1))
        o_ref[0] = (acc_ref[...] / safe).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_fa(G, Sq, Sp, D, bq, bk, scale, causal, seq_len, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_k = Sp // bk
    grid = (G, Sq // bq, n_k)
    kernel = functools.partial(
        _fa_kernel, n_k=n_k, bq=bq, bk=bk, scale=scale, causal=causal,
        seq_len=seq_len)
    kw = {}
    if not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
        kw["cost_estimate"] = pl.CostEstimate(
            flops=4 * G * Sq * Sp * D,
            bytes_accessed=G * (Sq * D * 3 + Sq * D),
            transcendentals=G * Sq * Sp,
        )
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, Sq, D), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda g, i, k: (g, i, 0)),
                pl.BlockSpec((1, bk, D), lambda g, i, k: (g, k, 0)),
                pl.BlockSpec((1, bk, D), lambda g, i, k: (g, k, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda g, i, k: (g, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, _LANES), jnp.float32),   # m
                pltpu.VMEM((bq, _LANES), jnp.float32),   # l
                pltpu.VMEM((bq, D), jnp.float32),        # acc
            ],
        ),
        interpret=interpret,
        **kw,
    )
    return jax.jit(fn)


def flash_attention(q, k, v, *, scale: float | None = None,
                    causal: bool = False, block_q: int = 128,
                    block_k: int = 128, interpret: bool | None = None):
    """q, k, v (B, H, S, D) -> (B, H, S, D) float32."""
    import jax.numpy as jnp

    if interpret is None:
        interpret = _interpret_default()
    B, H, S, D = q.shape
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    bq = min(block_q, _round_up(S, 8))
    bk = min(block_k, _round_up(S, _LANES))
    Sq = _round_up(S, bq)
    Sp = _round_up(S, bk)
    G = B * H

    def prep(t, Sx):
        t = t.reshape(G, S, D)
        if Sx != S:
            t = jnp.pad(t, ((0, 0), (0, Sx - S), (0, 0)))
        return t

    fn = _build_fa(G, Sq, Sp, D, bq, bk, float(scale), bool(causal), S,
                   interpret)
    out = fn(prep(q, Sq), prep(k, Sp), prep(v, Sp))
    return out[:, :S].reshape(B, H, S, D)
