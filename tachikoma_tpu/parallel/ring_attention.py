"""Ring attention — sequence-parallel exact integer attention over 'sp'.

The new design obligation SURVEY.md §5.7 names: the reference (a 2022
inference compiler) has no attention-distribution machinery; here long
sequences shard over an 'sp' mesh axis and K/V chunks rotate around the ring
with lax.ppermute while each device holds its Q shard.

Because qnn.attention's semantics are integer (running max; int32
wrap-around sums; exact integer normalization), the ring decomposition is
BIT-IDENTICAL to the single-device op regardless of ring size or rotation
order — max and modular addition are commutative/associative.  Three ring
phases:

  A: rotate K      -> global row max   m_i
  B: rotate K      -> global sum_i of p_ij = table[clip(m_i - s_ij)]
  C: rotate K, V   -> ctx_i += ((p*256 + sum//2)//sum) @ V_chunk

Float ring attention (flash-style online softmax) is NOT used for traces —
its rescaling breaks bit-determinism across ring sizes; the integer design
avoids online correction entirely by making phase A a separate reduction.
"""

from __future__ import annotations

import functools

import numpy as np

from ..ops.qnn import LUT_SIZE


def _ring_steps(axis_name: str):
    import jax

    n = jax.lax.psum(1, axis_name)
    return n


def ring_attention_int8_local(q, k, v, *, scores_scale: float, v_scale: float,
                              output_scale: float, axis_name: str,
                              rounding: str = "UPWARD"):
    """Per-shard body (call inside shard_map over `axis_name`).

    q, k, v: (..., S_local, D) int8 shards of the sequence dimension.
    Returns the int8 context shard, bit-identical to qnn.attention on the
    gathered sequence.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..ops import jax_ops  # noqa: F401  (enables x64: exact int64 ops)
    from ..ops.fixed_point import requantize_jnp

    from ..ops.jax_ops import _exp_q15
    nring = lax.psum(1, axis_name)
    perm = [(i, (i + 1) % nring) for i in range(nring)]

    qi = q.astype(jnp.int32)

    def scores(k_blk):
        return jnp.matmul(qi, jnp.swapaxes(k_blk.astype(jnp.int32), -1, -2),
                          preferred_element_type=jnp.int32)

    # phase A: global row max
    def maxbody(carry, _):
        m, k_blk = carry
        m = jnp.maximum(m, scores(k_blk).max(axis=-1, keepdims=True))
        k_blk = lax.ppermute(k_blk, axis_name, perm)
        return (m, k_blk), None

    m0 = jnp.full(qi.shape[:-1] + (1,), np.iinfo(np.int32).min, jnp.int32)
    (m, k_back), _ = lax.scan(maxbody, (m0, k), None, length=nring)

    # phase B: global sum of Q15 exp values
    def sumbody(carry, _):
        ssum, k_blk = carry
        d = jnp.clip(m - scores(k_blk), 0, LUT_SIZE - 1)
        # factorized Q15 exp == softmax_exp_table[d] (jnp.take lowers to
        # scalar gathers on TPU)
        p = _exp_q15(scores_scale, d)
        ssum = ssum + p.sum(axis=-1, keepdims=True, dtype=jnp.int32)
        k_blk = lax.ppermute(k_blk, axis_name, perm)
        return (ssum, k_blk), None

    s0 = jnp.zeros(qi.shape[:-1] + (1,), jnp.int32)
    (ssum, k_back), _ = lax.scan(sumbody, (s0, k_back), None, length=nring)
    ssum64 = ssum.astype(jnp.int64)

    # phase C: normalized integer weights @ V, int32 wraparound accumulation
    def ctxbody(carry, _):
        ctx, k_blk, v_blk = carry
        d = jnp.clip(m - scores(k_blk), 0, LUT_SIZE - 1)
        p = _exp_q15(scores_scale, d).astype(jnp.int64)
        u = ((p * 256 + ssum64 // 2) // ssum64).astype(jnp.int32)
        ctx = ctx + jnp.matmul(u, v_blk.astype(jnp.int32),
                               preferred_element_type=jnp.int32)
        k_blk = lax.ppermute(k_blk, axis_name, perm)
        v_blk = lax.ppermute(v_blk, axis_name, perm)
        return (ctx, k_blk, v_blk), None

    c0 = jnp.zeros(qi.shape, jnp.int32)
    (ctx, _, _), _ = lax.scan(ctxbody, (c0, k_back, v), None, length=nring)

    return requantize_jnp(
        ctx, v_scale / 256.0, 0, output_scale, 0,
        rounding=rounding, out_dtype="int8",
    )


def ring_attention_int8(q, k, v, mesh, *, scores_scale: float, v_scale: float,
                        output_scale: float, axis: str = "sp",
                        rounding: str = "UPWARD"):
    """Sequence-parallel integer attention over `mesh` axis `axis`.

    q/k/v: global (B, H, S, D) int8 arrays; S shards over `axis`.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(None, None, axis, None)
    fn = functools.partial(
        ring_attention_int8_local,
        scores_scale=scores_scale, v_scale=v_scale,
        output_scale=output_scale, axis_name=axis, rounding=rounding,
    )
    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    q = jax.device_put(q, NamedSharding(mesh, spec))
    k = jax.device_put(k, NamedSharding(mesh, spec))
    v = jax.device_put(v, NamedSharding(mesh, spec))
    return jax.jit(sharded)(q, k, v)
