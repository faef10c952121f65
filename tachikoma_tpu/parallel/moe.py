"""Expert parallelism — int8 mixture-of-experts dense over an 'ep' axis.

The reference has no EP (SURVEY.md §2.5: 'absent; optional'); this completes
the dp/tp/pp/sp/ep axis set TPU-natively: expert weight tensors shard over
'ep' (each device owns E/ep experts), every device computes its local
experts' contribution for the tokens routed to them, and an int32 psum
combines — exact, because masked contributions are disjoint and integer
addition commutes.

Routing here is dense one-hot dispatch (no all_to_all): for trace
determinism the gate indices are data, and the combine is bit-identical to
the single-device loop over experts.
"""

from __future__ import annotations

import functools

import numpy as np


def moe_dense_int8_reference(x, w_experts, gate_idx):
    """Single-device oracle: out[t] = x[t] @ W[gate_idx[t]] (int32 accum)."""
    T, K = x.shape
    E, K2, N = w_experts.shape
    out = np.zeros((T, N), np.int64)
    for e in range(E):
        mask = gate_idx == e
        if mask.any():
            out[mask] = x[mask].astype(np.int64) @ w_experts[e].astype(np.int64)
    return out.astype(np.int32)


def moe_dense_int8(x, w_experts, gate_idx, mesh, axis: str = "ep"):
    """Expert-parallel int8 MoE dense over `mesh` axis `axis`.

    x (T, K) int8 tokens; w_experts (E, K, N) int8 (E divisible by the axis
    size); gate_idx (T,) int32 expert assignment.  Returns (T, N) int32,
    bit-identical to moe_dense_int8_reference.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops import jax_ops  # noqa: F401

    E = w_experts.shape[0]
    nshard = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    assert E % nshard == 0, f"{E} experts over {nshard} shards"
    e_local = E // nshard

    def local(xs, ws, gs):
        # xs (T, K) replicated; ws (E/ep, K, N) local experts; gs (T,) replicated
        shard = jax.lax.axis_index(axis)
        base = shard * e_local
        out = jnp.zeros((xs.shape[0], ws.shape[-1]), jnp.int32)
        for i in range(e_local):
            sel = (gs == base + i)
            contrib = jnp.matmul(
                xs.astype(jnp.int32), ws[i].astype(jnp.int32),
                preferred_element_type=jnp.int32,
            )
            out = out + jnp.where(sel[:, None], contrib, 0)
        return jax.lax.psum(out, axis)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis, None, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    xw = jax.device_put(x, NamedSharding(mesh, P()))
    ww = jax.device_put(w_experts, NamedSharding(mesh, P(axis, None, None)))
    gw = jax.device_put(np.asarray(gate_idx, np.int32), NamedSharding(mesh, P()))
    return jax.jit(fn)(xw, ww, gw)


def top1_gate(x, w_gate):
    """Deterministic integer router: argmax of an int32 gating matmul."""
    scores = x.astype(np.int64) @ w_gate.astype(np.int64)
    return np.argmax(scores, axis=-1).astype(np.int32)
