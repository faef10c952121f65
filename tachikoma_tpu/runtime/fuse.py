"""Operator fusion for the integer inference path.

Rewrites qnn op chains into fused kernels so the int32 accumulator never
round-trips through HBM — the role the reference's FuseOps + TOPI schedule
fusion plays (`src/relay/transforms/fuse_ops.cc`), but targeted: the only
fusion that matters on TPU beyond what XLA already does is the
matmul/conv -> bias -> requantize -> clip epilogue, which XLA cannot fuse
because our exact requantize uses int64 (or emulated-64) arithmetic.

Patterns (all exact — fused np/jax impls are built from the same primitive
semantics and are bit-identical to the unfused chain):

  qnn.conv2d  -> [nn.bias_add(const)] -> qnn.requantize -> [clip]  => tk.conv2d_rq
  qnn.dense   -> [nn.bias_add(const)] -> qnn.requantize -> [clip]  => tk.dense_rq
  qnn.batch_matmul -> qnn.requantize                     -> [clip] => tk.bmm_rq

multiplier/shift are precomputed at fusion time (integers in attrs), so the
fused ops are float-free.
"""

from __future__ import annotations

import numpy as np

from ..ir.graph import Graph, GraphBuilder, Node
from ..ir.infer import infer_types
from ..ir.registry import get_op, infer_rule, jax_impl, np_impl, register_op
from ..ops.fixed_point import q_multiply_shift_np, q_multiply_shift_per_axis_np
from ..ops.pallas.qms32 import plan_requantize

_FUSABLE_HEAD = {"qnn.conv2d": "tk.conv2d_rq", "qnn.dense": "tk.dense_rq",
                 "qnn.batch_matmul": "tk.bmm_rq"}


def fuse_qnn(graph: Graph) -> Graph:
    g = infer_types(graph) if any(n.shape is None and n.dtype != "tuple" for n in graph.nodes) else graph
    users = g.users()
    outs = set(g.outputs)

    def single_user(name):
        # a graph output is observable: fusing past it would rewire the
        # output to the fused tail's value (Graph.users() does not count
        # graph outputs as users) — treat it as multi-user
        if name in outs:
            return None
        u = users[name]
        return g[u[0]] if len(u) == 1 else None

    # head -> (bias|None, mid_clip|None, requant, clip|None)
    chains: dict[str, tuple] = {}
    consumed: set[str] = set()
    for n in g.nodes:
        if n.op not in _FUSABLE_HEAD:
            continue
        # the fused epilogues are 32-bit fixed-point (qms32); W8A16 graphs
        # (int64 accumulators) stay unfused on the XLA wide path
        if n.attrs.get("out_dtype", "int32") != "int32":
            continue
        cur = single_user(n.name)
        bias = None
        if cur is not None and cur.op == "nn.bias_add" and g[cur.inputs[1]].is_const:
            bias = cur
            cur = single_user(cur.name)
        mid_clip = None
        if cur is not None and cur.op == "clip":
            # accumulator-domain clip (e.g. relu on int32); requantize is
            # monotone, so the bounds transform exactly to the output domain
            mid_clip = cur
            cur = single_user(cur.name)
        if cur is None or cur.op != "qnn.requantize":
            continue
        rq = cur
        cur = single_user(cur.name)
        clip = None
        if cur is not None and cur.op == "clip":
            clip = cur
        chains[n.name] = (bias, mid_clip, rq, clip)
        consumed.add(n.name)
        for t in (bias, mid_clip, rq, clip):
            if t is not None:
                consumed.add(t.name)

    if not chains:
        return fuse_block_stacks(fuse_chain_residual(fuse_conv_chains(g)))

    b = GraphBuilder(g.name)
    mapping: dict[str, str] = {}
    # vars/consts have no dependencies: emit first so fused heads can
    # reference bias constants that appear later in topological order
    for n in g.nodes:
        if n.is_var:
            mapping[n.name] = b.var(n.name, n.shape, n.dtype)
        elif n.is_const:
            mapping[n.name] = b.const(g.params[n.name], name=n.name)
    for n in g.nodes:
        if n.name in mapping:
            continue
        if n.name in chains:
            bias, mid_clip, rq, clip = chains[n.name]
            rqa = dict(rq.attrs)
            mult, shift = plan_requantize(
                rqa["input_scale"], float(rqa["output_scale"])
            )
            rounding = rqa.get("rounding", "UPWARD")
            ozp = int(rqa.get("output_zero_point", 0))
            out_dtype = rqa.get("out_dtype", "int8")
            info = np.iinfo(np.dtype(out_dtype))
            lo, hi = info.min, info.max

            if mid_clip is not None:
                # transform accumulator-domain bounds through the (monotone)
                # requantize: f(clip(x, a, b)) == clip(f(x), f(a), f(b))
                rq_izp = int(rqa.get("input_zero_point", 0))

                def f_bound(v):
                    vv = np.asarray(np.clip(v, np.iinfo(np.int32).min,
                                            np.iinfo(np.int32).max), np.int32)
                    vv = vv - np.int32(rq_izp)
                    if np.ndim(mult) > 0:
                        outs = [
                            int(q_multiply_shift_np(np.asarray([vv]), int(m), int(s), rounding)[0])
                            for m, s in zip(np.atleast_1d(mult), np.atleast_1d(shift))
                        ]
                    else:
                        outs = [int(q_multiply_shift_np(np.asarray([vv]), int(mult), int(shift), rounding)[0])]
                    # clamp into the out_dtype range first: channel bounds
                    # that all saturate are uniform after clamping
                    return [int(np.clip(o + ozp, info.min, info.max)) for o in outs]

                los = f_bound(int(mid_clip.attrs["a_min"]))
                his = f_bound(int(mid_clip.attrs["a_max"]))
                if len(set(los)) == 1 and len(set(his)) == 1:
                    lo = max(lo, los[0])
                    hi = min(hi, his[0])
                else:
                    # non-uniform per-channel bounds: skip fusing this chain
                    ins = [mapping[i] for i in n.inputs]
                    mapping[n.name] = b.call(n.op, *ins, name=n.name, **dict(n.attrs))
                    for t in (bias, mid_clip, rq, clip):
                        if t is not None:
                            consumed.discard(t.name)
                    continue
            if clip is not None:
                lo = max(lo, int(clip.attrs["a_min"]))
                hi = min(hi, int(clip.attrs["a_max"]))

            tail = clip or rq
            per_axis = np.ndim(mult) > 0
            attrs = {k: v for k, v in n.attrs.items() if k not in ("out_dtype",)}
            attrs.update(
                multiplier=[int(v) for v in np.atleast_1d(mult)] if per_axis else int(mult),
                shift=[int(v) for v in np.atleast_1d(shift)] if per_axis else int(shift),
                rq_input_zero_point=int(rqa.get("input_zero_point", 0)),
                output_zero_point=ozp,
                rounding=rounding,
                out_dtype=out_dtype,
            )
            if lo > info.min:
                attrs["a_min"] = lo
            if hi < info.max:
                attrs["a_max"] = hi
            ins = [mapping[i] for i in n.inputs]
            if bias is not None:
                ins.append(mapping[bias.inputs[1]])
                attrs["has_bias"] = True
            out = b.call(_FUSABLE_HEAD[n.op], *ins, name=tail.name, **attrs)
            for t in (n, bias, mid_clip, rq, clip):
                if t is not None:
                    mapping[t.name] = out
            continue
        if n.name in consumed:
            # tail members handled with the head; map resolved when head seen
            continue
        ins = [mapping[i] for i in n.inputs]
        mapping[n.name] = b.call(n.op, *ins, name=n.name, **dict(n.attrs))
    return fuse_block_stacks(fuse_chain_residual(fuse_conv_chains(
        infer_types(b.build([mapping[o] for o in g.outputs])))))


# ---------------------------------------------------------------------------
# fused op definitions
# ---------------------------------------------------------------------------

def _fused_epilogue_np(acc: np.ndarray, node: Node, bias: np.ndarray | None) -> np.ndarray:
    a = dict(node.attrs)
    if bias is not None:
        shape = [1] * acc.ndim
        shape[-1] = -1
        acc = acc + bias.reshape(shape).astype(np.int32)
    izp = int(a.get("rq_input_zero_point", 0))
    if izp:
        acc = acc - np.int32(izp)
    mult, shift = a["multiplier"], a["shift"]
    rounding = a.get("rounding", "UPWARD")
    if np.ndim(mult) > 0:
        v = q_multiply_shift_per_axis_np(
            acc, np.asarray(mult, np.int64), np.asarray(shift, np.int64),
            acc.ndim - 1, rounding,
        )
    else:
        v = q_multiply_shift_np(acc, int(mult), int(shift), rounding)
    ozp = int(a.get("output_zero_point", 0))
    if ozp:
        v = v + np.int32(ozp)
    out_dtype = a.get("out_dtype", "int8")
    info = np.iinfo(np.dtype(out_dtype))
    lo = max(int(a.get("a_min", info.min)), info.min)
    hi = min(int(a.get("a_max", info.max)), info.max)
    return np.clip(v, lo, hi).astype(out_dtype)


def _fused_epilogue_jax(acc, node: Node, bias):
    import jax.numpy as jnp

    from ..ops.pallas.qms32 import q_multiply_shift_u32

    a = dict(node.attrs)
    if bias is not None:
        shape = [1] * acc.ndim
        shape[-1] = -1
        acc = acc + bias.reshape(shape).astype(jnp.int32)
    izp = int(a.get("rq_input_zero_point", 0))
    if izp:
        acc = acc - jnp.int32(izp)
    mult, shift = a["multiplier"], a["shift"]
    rounding = a.get("rounding", "UPWARD")
    if np.ndim(mult) > 0:
        bshape = [1] * acc.ndim
        bshape[-1] = -1
        # keep m/s CONCRETE (numpy): q_multiply_shift_u32's high-word fast
        # path needs the shift values at trace time
        m = np.asarray(mult, np.int32).reshape(bshape)
        s = np.asarray(shift, np.int32).reshape(bshape)
    else:
        m, s = int(mult), int(shift)
    v = q_multiply_shift_u32(acc, m, s, rounding)
    ozp = int(a.get("output_zero_point", 0))
    if ozp:
        v = v + jnp.int32(ozp)
    out_dtype = a.get("out_dtype", "int8")
    info = np.iinfo(np.dtype(out_dtype))
    lo = max(int(a.get("a_min", info.min)), info.min)
    hi = min(int(a.get("a_max", info.max)), info.max)
    return jnp.clip(v, lo, hi).astype(jnp.dtype(out_dtype))


def _split_bias(node: Node, args):
    if node.attrs.get("has_bias"):
        return args[:-1], args[-1]
    return args, None


def _head_shadow(node: Node) -> Node:
    keep = {k: v for k, v in node.attrs.items()
            if k in ("strides", "padding", "dilation", "groups",
                     "input_zero_point", "kernel_zero_point",
                     "lhs_zero_point", "rhs_zero_point",
                     "transpose_a", "transpose_b")}
    keep["out_dtype"] = "int32"
    return node.with_(attrs=keep)


@infer_rule("tk.conv2d_rq")
def _conv_rq_rel(node, ins):
    from ..ops import nn as _nn

    shape, _ = _nn._conv2d_rel(node, ins[:2])
    return shape, node.attrs.get("out_dtype", "int8")


@np_impl("tk.conv2d_rq")
def _conv_rq_np(*args, node: Node):
    (data, weight), bias = _split_bias(node, args)
    acc = get_op("qnn.conv2d").np_impl(data, weight, node=_head_shadow(node))
    return _fused_epilogue_np(acc, node, bias)


@jax_impl("tk.conv2d_rq")
def _conv_rq_jax(*args, node: Node):
    import jax

    (data, weight), bias = _split_bias(node, args)
    a = dict(node.attrs)
    groups = int(a.get("groups", 1))
    from ..ops.nn import _pad4, _pair

    strides = _pair(a.get("strides", (1, 1)))
    padding = _pad4(a.get("padding", (0, 0, 0, 0)))
    dilation = _pair(a.get("dilation", (1, 1)))
    import os

    if (
        (jax.devices()[0].platform == "tpu" or os.environ.get("TK_FORCE_PALLAS"))
        and dilation == (1, 1)
        and int(a.get("kernel_zero_point", 0)) == 0
        and int(a.get("rq_input_zero_point", 0)) == 0
    ):
        from ..ops.pallas.conv_flat import (
            qconv2d_flat as qconv2d_int8,
            qconv2d_flat_supported as qconv2d_supported,
        )

        if qconv2d_supported(data.shape, weight.shape, strides, padding, groups):
            info = np.iinfo(np.dtype(a.get("out_dtype", "int8")))
            return qconv2d_int8(
                data, weight, bias=bias,
                multiplier=np.asarray(a["multiplier"], np.int32),
                shift=np.asarray(a["shift"], np.int32),
                strides=strides, padding=padding, groups=groups,
                input_zero_point=int(a.get("input_zero_point", 0)),
                out_zp=int(a.get("output_zero_point", 0)),
                rounding=a.get("rounding", "UPWARD"),
                out_dtype=a.get("out_dtype", "int8"),
                qmin=max(int(a.get("a_min", info.min)), info.min),
                qmax=min(int(a.get("a_max", info.max)), info.max),
            )
    acc = get_op("qnn.conv2d").jax_impl(data, weight, node=_head_shadow(node))
    return _fused_epilogue_jax(acc, node, bias)


@infer_rule("tk.dense_rq")
def _dense_rq_rel(node, ins):
    from ..ops import nn as _nn

    shape, _ = _nn._dense_rel(node, ins[:2])
    return shape, node.attrs.get("out_dtype", "int8")


@np_impl("tk.dense_rq")
def _dense_rq_np(*args, node: Node):
    (data, weight), bias = _split_bias(node, args)
    acc = get_op("qnn.dense").np_impl(data, weight, node=_head_shadow(node))
    return _fused_epilogue_np(acc, node, bias)


@jax_impl("tk.dense_rq")
def _dense_rq_jax(*args, node: Node):
    import jax

    (data, weight), bias = _split_bias(node, args)
    # Pallas fused kernel on TPU for 2D shapes; epilogue-composed lax
    # path elsewhere (identical bits either way)
    import os

    if (
        (jax.devices()[0].platform == "tpu" or os.environ.get("TK_FORCE_PALLAS"))
        and data.ndim >= 2
        and int(node.attrs.get("input_zero_point", 0)) == 0
        and int(node.attrs.get("kernel_zero_point", 0)) == 0
        and int(node.attrs.get("rq_input_zero_point", 0)) == 0
    ):
        from ..ops.pallas.matmul_int8 import qmatmul_int8

        a = dict(node.attrs)
        info = np.iinfo(np.dtype(a.get("out_dtype", "int8")))
        lead = data.shape[:-1]
        x2d = data.reshape(-1, data.shape[-1]) if data.ndim > 2 else data
        out = qmatmul_int8(
            x2d, weight,
            bias=bias,
            multiplier=np.asarray(a["multiplier"], np.int32),
            shift=np.asarray(a["shift"], np.int32),
            out_zp=int(a.get("output_zero_point", 0)),
            rounding=a.get("rounding", "UPWARD"),
            out_dtype=a.get("out_dtype", "int8"),
            qmin=max(int(a.get("a_min", info.min)), info.min),
            qmax=min(int(a.get("a_max", info.max)), info.max),
        )
        return out.reshape(*lead, out.shape[-1]) if data.ndim > 2 else out
    acc = get_op("qnn.dense").jax_impl(data, weight, node=_head_shadow(node))
    return _fused_epilogue_jax(acc, node, bias)


@infer_rule("tk.bmm_rq")
def _bmm_rq_rel(node, ins):
    from ..ops import nn as _nn

    shape, _ = _nn._bmm_rel(node, ins[:2])
    return shape, node.attrs.get("out_dtype", "int8")


@np_impl("tk.bmm_rq")
def _bmm_rq_np(*args, node: Node):
    (a, c), bias = _split_bias(node, args)
    acc = get_op("qnn.batch_matmul").np_impl(a, c, node=_head_shadow(node))
    return _fused_epilogue_np(acc, node, bias)


@jax_impl("tk.bmm_rq")
def _bmm_rq_jax(*args, node: Node):
    (a, c), bias = _split_bias(node, args)
    acc = get_op("qnn.batch_matmul").jax_impl(a, c, node=_head_shadow(node))
    return _fused_epilogue_jax(acc, node, bias)


# flops rules reuse the head op's MAC counts (for profiler rooflines)
def _reg_flops():
    from ..ops import nn as _nn

    register_op("tk.conv2d_rq", flops=_nn._conv2d_flops)
    register_op("tk.dense_rq", flops=_nn._dense_flops)
    register_op("tk.bmm_rq", flops=_nn._bmm_flops)


_reg_flops()


# ---------------------------------------------------------------------------
# conv-chain fusion: frame-resident conv sequences (AlterOpLayout analog)
# ---------------------------------------------------------------------------

def _chain_eligible(g: Graph, n: Node) -> bool:
    if n.op != "tk.conv2d_rq":
        return False
    a = n.attrs
    from ..ops.nn import _pair

    if _pair(a.get("strides", (1, 1))) != (1, 1):
        return False
    if _pair(a.get("dilation", (1, 1))) != (1, 1):
        return False
    if int(a.get("groups", 1)) != 1:
        return False
    # kernel_zero_point may be a per-channel vector (TFLite symmetric
    # per-channel weights store an all-zero vector)
    if np.any(np.asarray(a.get("kernel_zero_point", 0))):
        return False
    if int(a.get("rq_input_zero_point", 0)):
        return False
    if a.get("out_dtype", "int8") != "int8":
        return False
    data = g[n.inputs[0]]
    if data.shape is None or n.shape is None:
        return False
    return tuple(data.shape[1:3]) == tuple(n.shape[1:3])


def fuse_conv_chains(graph: Graph) -> Graph:
    """Fuse linear runs of stride-1 spatial-preserving tk.conv2d_rq nodes
    into tk.conv2d_chain super-nodes executed by the frame-resident Pallas
    path (`ops/pallas/conv_flat.py qconv2d_flat_chain`): intermediate
    activations never leave the over-wide flat layout, so each inner conv
    runs at raw kernel speed with zero relayout.  Exact: the chain kernels
    are bit-identical to the sequential ops (tests/test_conv_chain.py).

    The role of the reference's AlterOpLayout + NCHWc conv flow
    (`src/relay/transforms/alter_op_layout.cc`,
    `python/tvm/topi/x86/conv2d_int8.py:136`).  TK_DISABLE_CHAINS=1 turns
    the pass off (A/B knob; like the reference's disabled_pass)."""
    import os

    if os.environ.get("TK_DISABLE_CHAINS"):
        return graph
    g = infer_types(graph) if any(
        n.shape is None and n.dtype != "tuple" for n in graph.nodes) else graph
    users = g.users()
    outs = set(g.outputs)

    def single_user(name):
        # never extend a chain PAST a graph output (it may only end one):
        # swallowing an output member would rewire that output to the
        # chain's final result (Graph.users() ignores graph outputs)
        if name in outs:
            return None
        u = users.get(name, ())
        return g[u[0]] if len(u) == 1 else None

    # greedy maximal runs
    in_chain: set[str] = set()
    chains: list[list[Node]] = []
    for n in g.nodes:
        if n.name in in_chain or not _chain_eligible(g, n):
            continue
        # only start a chain at a node whose producer is NOT chainable into it
        prod = g[n.inputs[0]]
        if (prod.name not in in_chain and _chain_eligible(g, prod)
                and single_user(prod.name) is not None
                and single_user(prod.name).name == n.name
                and int(n.attrs.get("input_zero_point", 0))
                == int(prod.attrs.get("output_zero_point", 0))):
            continue  # will be picked up when the run head is visited
        run = [n]
        cur = n
        while True:
            nxt = single_user(cur.name)
            if (nxt is None or not _chain_eligible(g, nxt)
                    or nxt.inputs[0] != cur.name
                    or int(nxt.attrs.get("input_zero_point", 0))
                    != int(cur.attrs.get("output_zero_point", 0))):
                break
            run.append(nxt)
            cur = nxt
        # frames only pay off when they erase spatial relayout: a pure
        # 1x1 run is already a flat matmul (NHWC IS its natural layout) and
        # the tuned matmul route beats the frame kernel there (measured:
        # MobileNetV2 regressed ~10% with 1x1-only chains)
        def _spatial(m):
            ws = g[m.inputs[1]].shape
            return ws is not None and (ws[0] > 1 or ws[1] > 1)

        # NOTE: a tune-DB profitability gate (chain record vs sum of the
        # members' standalone records) was tried and REMOVED: isolated-op
        # records omit the inter-op NHWC relayout that chaining eliminates,
        # so the comparison mispredicts (ResNet-50 measured 4.4 ms with
        # chains vs 5.05 ms without, while the record sums said the
        # opposite).  The e2e-validated rule is simply: fuse runs that
        # contain a spatial kernel.
        if len(run) >= 2 and any(_spatial(m) for m in run):
            # VMEM gate: the chain executor splits large batches into
            # fitting sub-batches under lax.map (chain_batch_split); only
            # geometries that fit at NO sub-batch stay sequential
            from ..ops.nn import _pad4
            from ..ops.pallas.conv_flat import chain_batch_split

            d0 = g[run[0].inputs[0]]
            geo_stages, ci_list = [], []
            for m in run:
                ws = g[m.inputs[1]].shape
                pt, pl_, pb, pr = _pad4(m.attrs.get("padding", (0, 0, 0, 0)))
                geo_stages.append((int(ws[0]), int(ws[1]), pt, pl_, pb, pr))
                ci_list.append(int(ws[2]))
            if chain_batch_split(int(d0.shape[0]), int(d0.shape[1]),
                                 int(d0.shape[2]), geo_stages,
                                 ci_list=ci_list) is None:
                continue
            chains.append(run)
            in_chain.update(x.name for x in run)

    if not chains:
        return g

    head_of = {run[0].name: run for run in chains}
    member = {x.name: run for run in chains for x in run}

    b = GraphBuilder(g.name)
    mapping: dict[str, str] = {}
    for n in g.nodes:
        if n.is_var:
            mapping[n.name] = b.var(n.name, n.shape, n.dtype)
        elif n.is_const:
            mapping[n.name] = b.const(g.params[n.name], name=n.name)
    for n in g.nodes:
        if n.name in mapping:
            continue
        run = member.get(n.name)
        if run is not None:
            if n.name != run[0].name:
                continue  # emitted with the head
            ins = [mapping[run[0].inputs[0]]]
            stages = []
            for m in run:
                a = dict(m.attrs)
                ins.append(mapping[m.inputs[1]])
                st = {
                    "padding": tuple(a.get("padding", (0, 0, 0, 0))),
                    "multiplier": a["multiplier"],
                    "shift": a["shift"],
                    "input_zero_point": int(a.get("input_zero_point", 0)),
                    "output_zero_point": int(a.get("output_zero_point", 0)),
                    "rounding": a.get("rounding", "UPWARD"),
                    "has_bias": bool(a.get("has_bias")),
                }
                if "a_min" in a:
                    st["a_min"] = int(a["a_min"])
                if "a_max" in a:
                    st["a_max"] = int(a["a_max"])
                if st["has_bias"]:
                    ins.append(mapping[m.inputs[2]])
                stages.append(st)
            out = b.call("tk.conv2d_chain", *ins, name=run[-1].name,
                         stages=stages, out_dtype="int8")
            for m in run:
                mapping[m.name] = out
            continue
        ins = [mapping[i] for i in n.inputs]
        mapping[n.name] = b.call(n.op, *ins, name=n.name, **dict(n.attrs))
    return infer_types(b.build([mapping[o] for o in g.outputs]))


def fuse_chain_residual(graph: Graph) -> Graph:
    """Fold a residual qnn.add (+ optional clip) into the preceding
    tk.conv2d_chain's last-stage epilogue (the reference's conv "sum"
    post-op, `tachikoma_json_runtime.cc:292-388`): the chain output never
    round-trips HBM before the add.  Exact: the fused epilogue reproduces
    ops/qnn.py _qadd_like bit-for-bit (tests/test_conv_chain.py)."""
    import os

    if os.environ.get("TK_DISABLE_CHAINS"):
        return graph
    g = graph
    users = g.users()
    outs = set(g.outputs)

    def single_user(name):
        if name in outs:
            return None
        u = users.get(name, ())
        return g[u[0]] if len(u) == 1 else None

    # keyed by the ADD node (the fusion emits there: the residual operand
    # can be topologically AFTER the chain, so the fused node must sit at
    # the add's position, where both are available)
    fused: dict[str, tuple] = {}
    consumed: set[str] = set()
    for n in g.nodes:
        if n.op != "tk.conv2d_chain" or n.attrs.get("res_add"):
            continue
        add = single_user(n.name)
        if add is None or add.op != "qnn.add":
            continue
        if add.attrs.get("out_dtype", "int8") != "int8":
            continue
        if add.inputs[0] == n.name:
            res, lhs_keys = add.inputs[1], ("lhs", "rhs")
        else:
            res, lhs_keys = add.inputs[0], ("rhs", "lhs")
        if res == n.name:
            continue  # self-add
        clip = single_user(add.name)
        clip = clip if clip is not None and clip.op == "clip" else None
        fused[add.name] = (n, clip, res, lhs_keys)
        consumed.add(n.name)
        if clip is not None:
            consumed.add(clip.name)

    if not fused:
        return g

    b = GraphBuilder(g.name)
    mapping: dict[str, str] = {}
    for n in g.nodes:
        if n.is_var:
            mapping[n.name] = b.var(n.name, n.shape, n.dtype)
        elif n.is_const:
            mapping[n.name] = b.const(g.params[n.name], name=n.name)
    for n in g.nodes:
        if n.name in mapping or n.name in consumed:
            continue
        if n.name in fused:
            chain, clip, res, (ck, rk) = fused[n.name]
            add = n
            aa = dict(add.attrs)
            ra = {
                "lhs_scale": float(aa[f"{ck}_scale"]),
                "lhs_zero_point": int(aa.get(f"{ck}_zero_point", 0)),
                "rhs_scale": float(aa[f"{rk}_scale"]),
                "rhs_zero_point": int(aa.get(f"{rk}_zero_point", 0)),
                "output_scale": float(aa["output_scale"]),
                "output_zero_point": int(aa.get("output_zero_point", 0)),
                "rounding": aa.get("rounding", "UPWARD"),
            }
            if clip is not None:
                ra["a_min"] = int(clip.attrs["a_min"])
                ra["a_max"] = int(clip.attrs["a_max"])
            tail = clip or add
            ins = [mapping[i] for i in chain.inputs] + [mapping[res]]
            attrs = dict(chain.attrs)
            attrs["res_add"] = ra
            out = b.call("tk.conv2d_chain", *ins, name=tail.name, **attrs)
            for t in (chain, add, clip):
                if t is not None:
                    mapping[t.name] = out
            continue
        ins = [mapping[i] for i in n.inputs]
        mapping[n.name] = b.call(n.op, *ins, name=n.name, **dict(n.attrs))
    return infer_types(b.build([mapping[o] for o in g.outputs]))


def _chain_split_args(node: Node, args):
    """args -> (data, [(w, bias|None) per stage], residual|None)."""
    data = args[0]
    rest = list(args[1:])
    out = []
    for st in node.attrs["stages"]:
        w = rest.pop(0)
        bias = rest.pop(0) if st.get("has_bias") else None
        out.append((w, bias))
    residual = rest.pop(0) if node.attrs.get("res_add") else None
    return data, out, residual


def _chain_stage_node(st: dict, name: str) -> Node:
    attrs = {
        "strides": (1, 1), "padding": st["padding"],
        "multiplier": st["multiplier"], "shift": st["shift"],
        "input_zero_point": st.get("input_zero_point", 0),
        "output_zero_point": st.get("output_zero_point", 0),
        "rounding": st.get("rounding", "UPWARD"),
        "out_dtype": "int8",
    }
    for k in ("a_min", "a_max"):
        if k in st:
            attrs[k] = st[k]
    if st.get("has_bias"):
        attrs["has_bias"] = True
    return Node(name, "tk.conv2d_rq", ("d", "w"), attrs)


@infer_rule("tk.conv2d_chain")
def _chain_rel(node, ins):
    (ds, _) = ins[0]
    # weights appear in order; last stage's cout is the output channel
    # count; an optional trailing residual input (res_add attr) must match
    arg = 1
    cout = None
    for st in node.attrs["stages"]:
        cout = ins[arg][0][3]
        arg += 2 if st.get("has_bias") else 1
    if node.attrs.get("res_add"):
        (rs, rdt) = ins[arg]
        assert tuple(rs) == (ds[0], ds[1], ds[2], cout),             f"residual shape {rs} != chain output"
    return (ds[0], ds[1], ds[2], cout), "int8"


def _res_add_np(cur, residual, ra: dict):
    """Exact qnn.add epilogue (ops/qnn.py _qadd_like semantics)."""
    from ..ops.fixed_point import requantize_np

    so = float(ra["output_scale"])
    zo = int(ra.get("output_zero_point", 0))

    def req(v, sc, zc):
        if float(sc) == so and int(zc) == zo:
            return v.astype(np.int32)
        return requantize_np(v.astype(np.int32), float(sc), int(zc), so, zo,
                             rounding=ra.get("rounding", "UPWARD"),
                             out_dtype="int32")

    ql = req(cur, ra["lhs_scale"], ra.get("lhs_zero_point", 0))
    qr = req(residual, ra["rhs_scale"], ra.get("rhs_zero_point", 0))
    lo = max(int(ra.get("a_min", -128)), -128)
    hi = min(int(ra.get("a_max", 127)), 127)
    return np.clip(ql + qr - np.int32(zo), lo, hi).astype(np.int8)


@np_impl("tk.conv2d_chain")
def _chain_np(*args, node: Node):
    data, stages, residual = _chain_split_args(node, args)
    cur = data
    for st, (w, bias) in zip(node.attrs["stages"], stages):
        shadow = _chain_stage_node(st, node.name + "_st")
        sargs = (cur, w) if bias is None else (cur, w, bias)
        cur = get_op("tk.conv2d_rq").np_impl(*sargs, node=shadow)
    if residual is not None:
        cur = _res_add_np(np.asarray(cur), np.asarray(residual),
                          dict(node.attrs["res_add"]))
    return cur


@jax_impl("tk.conv2d_chain")
def _chain_jax(*args, node: Node):
    import os

    import jax

    data, wb, residual = _chain_split_args(node, args)
    ra = dict(node.attrs["res_add"]) if node.attrs.get("res_add") else None
    if jax.devices()[0].platform == "tpu" or os.environ.get("TK_FORCE_PALLAS"):
        from ..ops.pallas.conv_flat import chain_workload, qconv2d_flat_chain
        from ..tune.database import lookup_config

        n_, h_, w_, _ = data.shape
        dims = [(w.shape[0], w.shape[2], w.shape[3]) for (w, _) in wb]
        cfg = lookup_config(chain_workload(n_, h_, w_, dims))
        bm = int(cfg["bm"]) if cfg and "bm" in cfg else None
        bn_cap = int(cfg["bn"]) if cfg and "bn" in cfg else 128

        info = np.iinfo(np.int8)
        stages = []
        for st, (w, bias) in zip(node.attrs["stages"], wb):
            stages.append(dict(
                w=w, bias=bias,
                multiplier=np.asarray(st["multiplier"], np.int32),
                shift=np.asarray(st["shift"], np.int32),
                izp=int(st.get("input_zero_point", 0)),
                out_zp=int(st.get("output_zero_point", 0)),
                rounding=st.get("rounding", "UPWARD"),
                qmin=max(int(st.get("a_min", info.min)), info.min),
                qmax=min(int(st.get("a_max", info.max)), info.max),
                padding=tuple(st["padding"]),
            ))
        return qconv2d_flat_chain(data, stages, bm=bm, bn_cap=bn_cap,
                                  residual=residual, res_params=ra)
    cur = data
    for st, (w, bias) in zip(node.attrs["stages"], wb):
        shadow = _chain_stage_node(st, node.name + "_st")
        sargs = (cur, w) if bias is None else (cur, w, bias)
        cur = get_op("tk.conv2d_rq").jax_impl(*sargs, node=shadow)
    if residual is not None:
        import jax.numpy as jnp

        from ..ops.fixed_point import requantize_jnp

        so = float(ra["output_scale"])
        zo = int(ra.get("output_zero_point", 0))

        def req(v, sc, zc):
            if float(sc) == so and int(zc) == zo:
                return v.astype(jnp.int32)
            return requantize_jnp(v.astype(jnp.int32), float(sc), int(zc),
                                  so, zo,
                                  rounding=ra.get("rounding", "UPWARD"),
                                  out_dtype="int32")

        ql = req(cur, ra["lhs_scale"], ra.get("lhs_zero_point", 0))
        qr = req(residual, ra["rhs_scale"], ra.get("rhs_zero_point", 0))
        lo = max(int(ra.get("a_min", -128)), -128)
        hi = min(int(ra.get("a_max", 127)), 127)
        cur = jnp.clip(ql + qr - jnp.int32(zo), lo, hi).astype(jnp.int8)
    return cur


def _chain_flops(node: Node, ins):
    from ..ops import nn as _nn

    total = 0
    (ds, _) = ins[0]
    h, w = ds[1], ds[2]
    arg = 1
    for st in node.attrs["stages"]:
        (ws, _) = ins[arg]
        kh, kw, ci, co = ws
        total += 2 * ds[0] * h * w * co * kh * kw * ci
        arg += 2 if st.get("has_bias") else 1
    return total


register_op("tk.conv2d_chain", flops=_chain_flops)


# ---------------------------------------------------------------------------
# residual-block STACKS (round 5): consecutive identity-residual chains run
# stage-persistently — one entry pad / exit extract per stack
# ---------------------------------------------------------------------------


def fuse_block_stacks(graph: Graph) -> Graph:
    """Fuse runs of IDENTITY-residual tk.conv2d_chain nodes (res_add whose
    residual operand is the chain's own input) into tk.conv2d_block_stack
    super-nodes: the stack executor (`ops/pallas/conv_flat.py
    qconv2d_flat_block_stack`) keeps activations in the flat frame layout
    across every block, paying the NHWC entry/exit once per stack instead
    of once per block — the measured chain fixed overhead that capped
    C<=64 chains at 20-31 TOPS (round-4 RESULTS.md).  Exact: bit-identical
    to the per-block chain path (tests/test_conv_chain.py).
    TK_DISABLE_STACKS=1 opts out (chains still fuse)."""
    import os

    if os.environ.get("TK_DISABLE_CHAINS") or \
            os.environ.get("TK_DISABLE_STACKS"):
        return graph
    g = graph
    users = g.users()
    outs = set(g.outputs)

    def identity_block(n) -> bool:
        return (n.op == "tk.conv2d_chain" and bool(n.attrs.get("res_add"))
                and n.inputs[-1] == n.inputs[0])

    def sole_consumer(name):
        """The unique consuming NODE (an identity block uses its input
        twice — data + residual — which is still one consumer)."""
        if name in outs:
            return None
        u = set(users.get(name, ()))
        return g[next(iter(u))] if len(u) == 1 else None

    in_stack: set[str] = set()
    stacks: list[list[Node]] = []
    for n in g.nodes:
        if n.name in in_stack or not identity_block(n):
            continue
        prod = g[n.inputs[0]]
        if (identity_block(prod) and prod.name not in in_stack
                and sole_consumer(prod.name) is not None
                and sole_consumer(prod.name).name == n.name):
            continue  # picked up from the run head
        run = [n]
        cur = n
        while True:
            nxt = sole_consumer(cur.name)
            if (nxt is None or not identity_block(nxt)
                    or nxt.inputs[0] != cur.name):
                break
            # zero points must chain: next block's first-stage izp is the
            # producer's res_add output zp
            if int(nxt.attrs["stages"][0].get("input_zero_point", 0)) != \
                    int(cur.attrs["res_add"].get("output_zero_point", 0)):
                break
            run.append(nxt)
            cur = nxt
        if len(run) >= 2:
            stacks.append(run)
            in_stack.update(x.name for x in run)

    if not stacks:
        return g

    member = {x.name: run for run in stacks for x in run}
    b = GraphBuilder(g.name)
    mapping: dict[str, str] = {}
    for n in g.nodes:
        if n.is_var:
            mapping[n.name] = b.var(n.name, n.shape, n.dtype)
        elif n.is_const:
            mapping[n.name] = b.const(g.params[n.name], name=n.name)
    for n in g.nodes:
        if n.name in mapping:
            continue
        run = member.get(n.name)
        if run is not None:
            if n.name != run[0].name:
                continue  # emitted with the head
            ins = [mapping[run[0].inputs[0]]]
            blocks = []
            for m in run:
                # chain inputs: data, then (w [, bias]) per stage, then the
                # residual (== data, dropped: the stack implies it)
                for wb in m.inputs[1:-1]:
                    ins.append(mapping[wb])
                blocks.append({"stages": list(m.attrs["stages"]),
                               "res_add": dict(m.attrs["res_add"])})
            out = b.call("tk.conv2d_block_stack", *ins, name=run[-1].name,
                         blocks=blocks, out_dtype="int8")
            for m in run:
                mapping[m.name] = out
            continue
        ins = [mapping[i] for i in n.inputs]
        mapping[n.name] = b.call(n.op, *ins, name=n.name, **dict(n.attrs))
    return infer_types(b.build([mapping[o] for o in g.outputs]))


def _stack_split_args(node: Node, args):
    """args -> (data, [[(w, bias|None) per stage] per block])."""
    data = args[0]
    rest = list(args[1:])
    out = []
    for blk in node.attrs["blocks"]:
        stages = []
        for st in blk["stages"]:
            w = rest.pop(0)
            bias = rest.pop(0) if st.get("has_bias") else None
            stages.append((w, bias))
        out.append(stages)
    return data, out


@infer_rule("tk.conv2d_block_stack")
def _stack_rel(node, ins):
    (ds, _) = ins[0]
    arg = 1
    cout = None
    for blk in node.attrs["blocks"]:
        for st in blk["stages"]:
            cout = ins[arg][0][3]
            arg += 2 if st.get("has_bias") else 1
    return (ds[0], ds[1], ds[2], cout), "int8"


@np_impl("tk.conv2d_block_stack")
def _stack_np(*args, node: Node):
    data, blocks_wb = _stack_split_args(node, args)
    cur = np.asarray(data)
    for blk, wb in zip(node.attrs["blocks"], blocks_wb):
        block_in = cur
        for st, (w, bias) in zip(blk["stages"], wb):
            shadow = _chain_stage_node(st, node.name + "_st")
            sargs = (cur, w) if bias is None else (cur, w, bias)
            cur = get_op("tk.conv2d_rq").np_impl(*sargs, node=shadow)
        if blk.get("res_add"):
            cur = _res_add_np(np.asarray(cur), block_in,
                              dict(blk["res_add"]))
    return cur


@jax_impl("tk.conv2d_block_stack")
def _stack_jax(*args, node: Node):
    import os

    import jax

    data, blocks_wb = _stack_split_args(node, args)
    if jax.devices()[0].platform == "tpu" or \
            os.environ.get("TK_FORCE_PALLAS"):
        from ..ops.pallas.conv_flat import qconv2d_flat_block_stack

        info = np.iinfo(np.int8)
        blocks = []
        for blk, wb in zip(node.attrs["blocks"], blocks_wb):
            stages = []
            for st, (w, bias) in zip(blk["stages"], wb):
                stages.append(dict(
                    w=w, bias=bias,
                    multiplier=np.asarray(st["multiplier"], np.int32),
                    shift=np.asarray(st["shift"], np.int32),
                    izp=int(st.get("input_zero_point", 0)),
                    out_zp=int(st.get("output_zero_point", 0)),
                    rounding=st.get("rounding", "UPWARD"),
                    qmin=max(int(st.get("a_min", info.min)), info.min),
                    qmax=min(int(st.get("a_max", info.max)), info.max),
                    padding=tuple(st["padding"]),
                ))
            rp = dict(blk["res_add"]) if blk.get("res_add") else None
            blocks.append((stages, rp))
        return qconv2d_flat_block_stack(data, blocks)
    # CPU XLA: sequential chain + add (same code shape as _chain_jax)
    import jax.numpy as jnp

    from ..ops.fixed_point import requantize_jnp

    cur = data
    for blk, wb in zip(node.attrs["blocks"], blocks_wb):
        block_in = cur
        for st, (w, bias) in zip(blk["stages"], wb):
            shadow = _chain_stage_node(st, node.name + "_st")
            sargs = (cur, w) if bias is None else (cur, w, bias)
            cur = get_op("tk.conv2d_rq").jax_impl(*sargs, node=shadow)
        ra = blk.get("res_add")
        if ra:
            so = float(ra["output_scale"])
            zo = int(ra.get("output_zero_point", 0))

            def req(v, sc, zc):
                if float(sc) == so and int(zc) == zo:
                    return v.astype(jnp.int32)
                return requantize_jnp(v.astype(jnp.int32), float(sc),
                                      int(zc), so, zo,
                                      rounding=ra.get("rounding", "UPWARD"),
                                      out_dtype="int32")

            ql = req(cur, ra["lhs_scale"], ra.get("lhs_zero_point", 0))
            qr = req(block_in, ra["rhs_scale"],
                     ra.get("rhs_zero_point", 0))
            lo = max(int(ra.get("a_min", -128)), -128)
            hi = min(int(ra.get("a_max", 127)), 127)
            cur = jnp.clip(ql + qr - jnp.int32(zo), lo, hi).astype(jnp.int8)
    return cur


def _stack_flops(node: Node, ins):
    (ds, _) = ins[0]
    total = 0
    arg = 1
    for blk in node.attrs["blocks"]:
        for st in blk["stages"]:
            (ws, _) = ins[arg]
            kh, kw, ci, co = ws
            total += 2 * ds[0] * ds[1] * ds[2] * co * kh * kw * ci
            arg += 2 if st.get("has_bias") else 1
    return total


register_op("tk.conv2d_block_stack", flops=_stack_flops)
