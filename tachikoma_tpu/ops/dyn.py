"""Data-dependent-shape ops (the reference's `dyn.*` dialect,
`/root/reference/src/relay/op/dyn/` + Relay VM `vm/bytecode.h:50`).

TPU-first design: XLA compiles static shapes only, so genuinely dynamic
outputs take one of two forms here —

  * **bounded ops** (`dyn.nonzero`): the output is padded to a static
    `max_count` bound and paired with a valid-count scalar — the same
    convention TVM's static-shape `unique`/NMS use and the only form a
    compiled TPU program (or a pinned binary trace) can carry.  Semantics
    are exact and backend-identical, including the padding bytes.
  * **shape-from-tensor ops** (`dyn.reshape`): the output SHAPE depends on
    a tensor VALUE, unrepresentable in one static program.  The oracle
    interpreter executes it directly; compiled execution goes through
    `runtime/dynshape.py`, which concrete-folds the shape input at dispatch
    time and re-specializes (and caches) a static graph per distinct shape
    — the dispatch-time analog of the reference's DynamicToStatic pass
    (`src/relay/transforms/dynamic_to_static.cc`) where it is possible, and
    of the VM's runtime shape computation where it is not.
"""

from __future__ import annotations

import numpy as np

from ..ir.graph import Node
from ..ir.registry import infer_rule, jax_impl, np_impl, register_op


def _jnp():
    import jax.numpy as jnp

    return jnp


# ---------------------------------------------------------------------------
# dyn.nonzero — bounded: (indices (max_count, ndim) int32 padded with -1,
#                         count (1,) int32)
# ---------------------------------------------------------------------------

@infer_rule("dyn.nonzero")
def _nonzero_rel(node: Node, ins):
    (s, _) = ins[0]
    mc = int(node.attrs["max_count"])
    return [((mc, max(len(s), 1)), "int32"), ((1,), "int32")]


@np_impl("dyn.nonzero")
def _nonzero_np(a, *, node: Node):
    mc = int(node.attrs["max_count"])
    nd = max(a.ndim, 1)
    idx = np.argwhere(a)  # (k, ndim), row-major (C) order
    k = min(len(idx), mc)
    out = np.full((mc, nd), -1, np.int32)
    if k:
        out[:k] = idx[:k]
    return [out, np.array([k], np.int32)]


@jax_impl("dyn.nonzero")
def _nonzero_jax(a, *, node: Node):
    jnp = _jnp()
    mc = int(node.attrs["max_count"])
    # jnp.nonzero with a static size and -1 fill matches the oracle's
    # row-major order and padding exactly
    idxs = jnp.nonzero(a, size=mc, fill_value=-1)
    out = jnp.stack(idxs, axis=-1).astype(jnp.int32)
    total = jnp.minimum((a != 0).sum(), mc).astype(jnp.int32)
    return [out, total.reshape(1)]


register_op("dyn.nonzero",
            flops=lambda node, ins: int(np.prod(ins[0][0] or (1,))))


# ---------------------------------------------------------------------------
# dyn.reshape — shape from a tensor value
# ---------------------------------------------------------------------------

@infer_rule("dyn.reshape")
def _dyn_reshape_rel(node: Node, ins):
    (ds, ddt) = ins[0]
    # the shape tensor's VALUE determines the output shape: statically
    # unknown unless the graph executor specialized it (dynshape.py folds
    # this op to a static `reshape` before compiled execution)
    return (None, ddt)


@np_impl("dyn.reshape")
def _dyn_reshape_np(a, shp, *, node: Node):
    return np.reshape(a, tuple(int(v) for v in np.asarray(shp).ravel()))


@jax_impl("dyn.reshape")
def _dyn_reshape_jax(a, shp, *, node: Node):
    # only reachable when the shape input is concrete at trace time
    # (after dynshape specialization or with a const shape input)
    shape = tuple(int(v) for v in np.asarray(shp).ravel())
    return _jnp().reshape(a, shape)


register_op("dyn.reshape", flops=lambda node, ins: 0)
