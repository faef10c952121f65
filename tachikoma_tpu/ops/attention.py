"""tk.attention — fused float attention op (flash kernel on TPU).

The float twin of qnn.attention: ir/transforms.py fuse_attention rewrites
the zoo's attention subgraph (batch_matmul(transpose_b) -> scale multiply
-> [causal mask add] -> softmax -> batch_matmul) into this single op, whose
TPU implementation is the blockwise flash kernel
(ops/pallas/flash_attention.py) — the (S, S) score matrix never reaches
HBM.  The numpy oracle is the naive computation; CPU XLA mirrors it.

causal=True realizes the mask as a hard -inf block structure; graphs that
used an additive -30 mask (models/transformer.py _causal_attention) differ
by exp(-30) ~ 1e-13 relative — inside every float tolerance used here.
"""

from __future__ import annotations

import numpy as np

from ..ir.graph import Node
from ..ir.registry import infer_rule, jax_impl, np_impl, register_op


@infer_rule("tk.attention")
def _attn_rel(node: Node, ins):
    (qs, qdt) = ins[0]
    return tuple(qs), "float32"


@np_impl("tk.attention")
def _attn_np(q, k, v, *, node: Node):
    scale = float(node.attrs.get("scale", 1.0 / np.sqrt(q.shape[-1])))
    causal = bool(node.attrs.get("causal", False))
    s = np.einsum("bhqd,bhkd->bhqk", q.astype(np.float32),
                  k.astype(np.float32)).astype(np.float64) * scale
    if causal:
        S = q.shape[2]
        s = np.where(np.triu(np.ones((S, S), bool), 1), -1e30, s)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    out = np.einsum("bhqk,bhkd->bhqd", p, v.astype(np.float64))
    return out.astype(np.float32)


@jax_impl("tk.attention")
def _attn_jax(q, k, v, *, node: Node):
    import jax
    import jax.numpy as jnp

    scale = float(node.attrs.get("scale", 1.0 / np.sqrt(q.shape[-1])))
    causal = bool(node.attrs.get("causal", False))
    if jax.devices()[0].platform == "tpu":
        from .pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale, causal=causal)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * jnp.float32(scale)
    if causal:
        S = q.shape[2]
        mask = jnp.triu(jnp.ones((S, S), bool), 1)
        s = jnp.where(mask, jnp.float32(-1e30), s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v).astype(jnp.float32)


register_op("tk.attention",
            flops=lambda node, ins: 4 * int(np.prod(ins[0][0][:3]))
            * ins[1][0][2] * ins[0][0][3])
