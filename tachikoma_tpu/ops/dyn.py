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

# ---------------------------------------------------------------------------
# shape-from-tensor ops: ONE fold registry shared by the oracle impl, the
# JAX impl (reachable only with concrete shape inputs), and
# runtime/dynshape.py's dispatch-time specializer — all three paths execute
# the SAME static-twin rewrite, so oracle == specialized == jax by
# construction.  Covers the FULL reference dyn registry
# (/root/reference/src/relay/op/dyn/: tensor/transform.cc,
# algorithm/topk.cc, nn/pad.cc, nn/upsampling.cc, image/resize.cc):
# reshape, tile, broadcast_to, full, ones, zeros, one_hot, strided_slice,
# topk, expand_dims, squeeze, sparse_to_dense, nn.pad, nn.upsampling(3d),
# image.resize2d — 16/16.
# ---------------------------------------------------------------------------

# op -> (fold_positions, fold_fn(node, folded_vals) -> (static_op,
#        kept_input_positions, static_attrs))
DYN_FOLDERS: dict = {}


def dyn_fold(opname: str, positions: tuple):
    def deco(fn):
        DYN_FOLDERS[opname] = (positions, fn)
        return fn
    return deco


def fold_to_static(node: Node, vals) -> tuple[Node, tuple]:
    """(static twin node, kept original input positions) given the folded
    VALUES of the dyn node's shape inputs (in fold-position order)."""
    positions, fn = DYN_FOLDERS[node.op]
    op2, keep, attrs = fn(node, [np.asarray(v) for v in vals])
    n2 = node.with_(op=op2, inputs=tuple(node.inputs[i] for i in keep),
                    attrs=attrs)
    return n2, keep


def _ints(v) -> list:
    return [int(x) for x in np.asarray(v).ravel()]


@dyn_fold("dyn.reshape", (1,))
def _fold_reshape(node, vals):
    return "reshape", (0,), {"newshape": tuple(_ints(vals[0]))}


@dyn_fold("dyn.tile", (1,))
def _fold_tile(node, vals):
    return "tile", (0,), {"reps": tuple(_ints(vals[0]))}


@dyn_fold("dyn.broadcast_to", (1,))
def _fold_broadcast_to(node, vals):
    return "broadcast_to", (0,), {"shape": tuple(_ints(vals[0]))}


@dyn_fold("dyn.full", (0, 1))
def _fold_full(node, vals):
    fill, shp = vals
    dtype = node.attrs.get("dtype") or str(fill.dtype)
    return "full", (), {"shape": tuple(_ints(shp)),
                        "fill_value": fill.ravel()[0].item(),
                        "dtype": dtype}


@dyn_fold("dyn.one_hot", (1,))
def _fold_one_hot(node, vals):
    attrs = {k: v for k, v in node.attrs.items()}
    attrs["depth"] = int(np.asarray(vals[0]).ravel()[0])
    return "one_hot", (0,), attrs


@dyn_fold("dyn.strided_slice", (1, 2, 3))
def _fold_strided_slice(node, vals):
    begin, end, strides = (_ints(v) for v in vals)
    attrs = {"begin": begin, "end": end, "strides": strides}
    if node.attrs.get("axes") is not None:
        attrs["axes"] = list(node.attrs["axes"])
    return "strided_slice", (0,), attrs


@dyn_fold("dyn.topk", (1,))
def _fold_topk(node, vals):
    attrs = {k: v for k, v in node.attrs.items()}
    attrs["k"] = int(np.asarray(vals[0]).ravel()[0])
    return "topk", (0,), attrs


# -- remaining reference dyn registry (transform.cc:299,318,685,740,599;
#    nn/pad.cc:109, nn/upsampling.cc:90,165, image/resize.cc:87) ---------

@dyn_fold("dyn.ones", (0,))
def _fold_ones(node, vals):
    return "ones", (), {"shape": tuple(_ints(vals[0])),
                        "dtype": node.attrs.get("dtype", "float32")}


@dyn_fold("dyn.zeros", (0,))
def _fold_zeros(node, vals):
    return "zeros", (), {"shape": tuple(_ints(vals[0])),
                         "dtype": node.attrs.get("dtype", "float32")}


@dyn_fold("dyn.expand_dims", (1,))
def _fold_expand_dims(node, vals):
    return "expand_dims", (0,), {
        "axis": int(np.asarray(vals[0]).ravel()[0]),
        "num_newaxis": int(node.attrs.get("num_newaxis", 1))}


@dyn_fold("dyn.squeeze", (1,))
def _fold_squeeze(node, vals):
    return "squeeze", (0,), {"axis": _ints(vals[0])}


@dyn_fold("dyn.sparse_to_dense", (3,))
def _fold_sparse_to_dense(node, vals):
    # inputs: (sparse_indices, sparse_values, default_value, output_shape)
    return "sparse_to_dense", (0, 1, 2), {
        "output_shape": tuple(_ints(vals[0]))}


@dyn_fold("dyn.nn.pad", (1, 2))
def _fold_nn_pad(node, vals):
    pw, pv = vals
    pw = np.asarray(pw).reshape(-1, 2)
    val = pv.ravel()[0].item()
    return "nn.pad", (0,), {
        "pad_width": [(int(b), int(e)) for b, e in pw],
        "pad_value": val,
        "pad_mode": node.attrs.get("pad_mode", "constant")}


@dyn_fold("dyn.nn.upsampling", (1, 2))
def _fold_nn_upsampling(node, vals):
    attrs = {k: v for k, v in node.attrs.items()}
    attrs["scale_h"] = float(np.asarray(vals[0]).ravel()[0])
    attrs["scale_w"] = float(np.asarray(vals[1]).ravel()[0])
    return "nn.upsampling", (0,), attrs


@dyn_fold("dyn.nn.upsampling3d", (1, 2, 3))
def _fold_nn_upsampling3d(node, vals):
    attrs = {k: v for k, v in node.attrs.items()}
    attrs["scale_d"] = float(np.asarray(vals[0]).ravel()[0])
    attrs["scale_h"] = float(np.asarray(vals[1]).ravel()[0])
    attrs["scale_w"] = float(np.asarray(vals[2]).ravel()[0])
    return "nn.upsampling3d", (0,), attrs


@dyn_fold("dyn.image.resize2d", (1,))
def _fold_image_resize2d(node, vals):
    # roi (optional 3rd input) only applies to tf_crop_and_resize, which the
    # static twin rejects; drop it at fold time like DynamicToStatic does
    attrs = {k: v for k, v in node.attrs.items()}
    attrs["size"] = tuple(_ints(vals[0]))
    return "image.resize2d", (0,), attrs


def _delegate_np(*args, node: Node):
    from ..ir.registry import get_op

    positions, _ = DYN_FOLDERS[node.op]
    n2, keep = fold_to_static(node, [args[p] for p in positions])
    return get_op(n2.op).np_impl(*[args[i] for i in keep], node=n2)


def _delegate_jax(*args, node: Node):
    # only reachable when the shape inputs are concrete at trace time
    # (after dynshape specialization or with const shape inputs)
    from ..ir.registry import get_op

    positions, _ = DYN_FOLDERS[node.op]
    n2, keep = fold_to_static(node, [np.asarray(args[p])
                                     for p in positions])
    return get_op(n2.op).jax_impl(*[args[i] for i in keep], node=n2)


def _dyn_data_rel(node: Node, ins):
    # output shape depends on a tensor VALUE: statically unknown until the
    # dispatch-time specializer (runtime/dynshape.py) folds it
    return (None, ins[0][1])


for _name in ("dyn.reshape", "dyn.tile", "dyn.broadcast_to",
              "dyn.strided_slice"):
    infer_rule(_name)(_dyn_data_rel)
    np_impl(_name)(_delegate_np)
    jax_impl(_name)(_delegate_jax)
    register_op(_name, flops=lambda node, ins: 0)


@infer_rule("dyn.full")
def _dyn_full_rel(node: Node, ins):
    dt = node.attrs.get("dtype") or ins[0][1]
    return (None, dt)


@infer_rule("dyn.one_hot")
def _dyn_one_hot_rel(node: Node, ins):
    return (None, node.attrs.get("dtype", "float32"))


@infer_rule("dyn.topk")
def _dyn_topk_rel(node: Node, ins):
    vdt = ins[0][1]
    idt = node.attrs.get("dtype", "int32")
    ret = node.attrs.get("ret_type", "both")
    if ret == "both":
        return [(None, vdt), (None, idt)]
    return (None, vdt if ret == "values" else idt)


for _name in ("dyn.full", "dyn.one_hot", "dyn.topk"):
    np_impl(_name)(_delegate_np)
    jax_impl(_name)(_delegate_jax)
    register_op(_name, flops=lambda node, ins: 0)


for _name in ("dyn.expand_dims", "dyn.squeeze", "dyn.nn.pad",
              "dyn.nn.upsampling", "dyn.nn.upsampling3d",
              "dyn.image.resize2d"):
    infer_rule(_name)(_dyn_data_rel)
    np_impl(_name)(_delegate_np)
    jax_impl(_name)(_delegate_jax)
    register_op(_name, flops=lambda node, ins: 0)


@infer_rule("dyn.ones")
def _dyn_ones_rel(node: Node, ins):
    return (None, node.attrs.get("dtype", "float32"))


@infer_rule("dyn.zeros")
def _dyn_zeros_rel(node: Node, ins):
    return (None, node.attrs.get("dtype", "float32"))


@infer_rule("dyn.sparse_to_dense")
def _dyn_std_rel(node: Node, ins):
    return (None, ins[1][1])


for _name in ("dyn.ones", "dyn.zeros", "dyn.sparse_to_dense"):
    np_impl(_name)(_delegate_np)
    jax_impl(_name)(_delegate_jax)
    register_op(_name, flops=lambda node, ins: 0)
