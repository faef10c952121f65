"""Data-dependent control flow: tk.cond and tk.while_loop.

The reference executes If/loops through the Relay VM's bytecode
(`include/tvm/runtime/vm/bytecode.h:50-70` If/Goto opcodes,
`src/runtime/vm/vm.cc` RunLoop) because its graph executor is a static DAG.
Our IR is also a static DAG — control flow enters as FIRST-CLASS OPS whose
branch/body are nested subgraphs carried as serialized Graph JSON attrs:

  tk.cond(pred, *args, then_graph=<json>, else_graph=<json>)
      pred: scalar (bool/int); each subgraph maps args -> outputs; both
      branches must agree on output types (checked at infer time)
  tk.while_loop(*state, cond_graph=<json>, body_graph=<json>)
      cond_graph: state -> scalar bool; body_graph: state -> state
      (same types — the lax.while_loop carry contract)

XLA lowering is `lax.cond` / `lax.while_loop` — compiler-friendly control
flow with both branches compiled once (no Python re-tracing per iteration),
exactly the TPU-native replacement for the VM's bytecode dispatch.  The numpy oracle
interprets the chosen branch / iterates the loop directly, so integer
graphs stay bit-exact across backends.

Serialized-JSON attrs keep the whole infra working unchanged: structural
hash, text format, Graph.to_json round-trip, and trace records (the
subgraph travels inside the op's attrs, the op's executed output is the
record payload).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import numpy as np

from ..ir.graph import Graph, Node
from ..ir.registry import TensorType, infer_rule, jax_impl, np_impl


@lru_cache(maxsize=256)
def _load_subgraph(graph_json: str) -> Graph:
    return Graph.from_json(graph_json)


def _sub_out_types(g: Graph) -> list[tuple[tuple, str]]:
    from ..ir.infer import infer_types

    g = infer_types(g) if any(
        n.shape is None and n.dtype != "tuple" for n in g.nodes) else g
    return [(tuple(g[o].shape), g[o].dtype) for o in g.outputs]


def _check_subgraph_inputs(g: Graph, ins: Sequence[TensorType], what: str):
    vars_ = g.inputs
    if len(vars_) != len(ins):
        raise TypeError(
            f"{what} takes {len(vars_)} inputs, got {len(ins)}")
    for v, (shape, dtype) in zip(vars_, ins):
        if tuple(v.shape) != tuple(shape) or v.dtype != dtype:
            raise TypeError(
                f"{what} input {v.name}: declared {v.dtype}{list(v.shape)} "
                f"vs supplied {dtype}{list(shape)}")


def _run_sub_np(g: Graph, args) -> list[np.ndarray]:
    from ..runtime.interpreter import run_graph

    return run_graph(g, {v.name: a for v, a in zip(g.inputs, args)})


def _make_sub_jax(g: Graph):
    """args-tuple -> outputs-list traced function over a subgraph."""
    from ..ir.graph import CONST, TUPLE, TUPLE_GET_ITEM, VAR
    from ..ir.infer import infer_types
    from ..ir.registry import get_op

    g = infer_types(g) if any(
        n.shape is None and n.dtype != "tuple" for n in g.nodes) else g
    var_names = [n.name for n in g.inputs]

    def run(args):
        env = dict(zip(var_names, args))
        for node in g.nodes:
            if node.op == VAR:
                continue
            if node.op == CONST:
                env[node.name] = g.params[node.name]
            elif node.op == TUPLE:
                env[node.name] = [env[i] for i in node.inputs]
            elif node.op == TUPLE_GET_ITEM:
                env[node.name] = env[node.inputs[0]][int(node.attrs["index"])]
            else:
                op = get_op(node.op)
                env[node.name] = op.jax_impl(
                    *[env[i] for i in node.inputs], node=node)
        return [env[o] for o in g.outputs]

    return run


# -- tk.cond -----------------------------------------------------------------

@infer_rule("tk.cond")
def _cond_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    then_g = _load_subgraph(node.attrs["then_graph"])
    else_g = _load_subgraph(node.attrs["else_graph"])
    pred_shape, _ = ins[0]
    if tuple(pred_shape) not in ((), (1,)):
        raise TypeError(f"tk.cond predicate must be scalar, got {pred_shape}")
    _check_subgraph_inputs(then_g, ins[1:], "tk.cond then_graph")
    _check_subgraph_inputs(else_g, ins[1:], "tk.cond else_graph")
    t_outs = _sub_out_types(then_g)
    e_outs = _sub_out_types(else_g)
    if t_outs != e_outs:
        raise TypeError(
            f"tk.cond branches disagree on output types: {t_outs} vs {e_outs}")
    if len(t_outs) == 1:
        return t_outs[0]
    return list(t_outs)  # tuple value: list of (shape, dtype)


@np_impl("tk.cond")
def _cond_np(pred, *args, node: Node):
    g = _load_subgraph(node.attrs["then_graph"] if bool(np.asarray(pred).reshape(()))
                       else node.attrs["else_graph"])
    outs = _run_sub_np(g, args)
    return outs[0] if len(outs) == 1 else list(outs)


@jax_impl("tk.cond")
def _cond_jax(pred, *args, node: Node):
    import jax.numpy as jnp
    from jax import lax

    then_fn = _make_sub_jax(_load_subgraph(node.attrs["then_graph"]))
    else_fn = _make_sub_jax(_load_subgraph(node.attrs["else_graph"]))
    p = jnp.asarray(pred).reshape(()).astype(bool)
    outs = lax.cond(p, then_fn, else_fn, tuple(args))
    return outs[0] if len(outs) == 1 else list(outs)


# -- tk.while_loop -----------------------------------------------------------

@infer_rule("tk.while_loop")
def _while_rel(node: Node, ins: Sequence[TensorType]) -> TensorType:
    cond_g = _load_subgraph(node.attrs["cond_graph"])
    body_g = _load_subgraph(node.attrs["body_graph"])
    _check_subgraph_inputs(cond_g, ins, "tk.while_loop cond_graph")
    _check_subgraph_inputs(body_g, ins, "tk.while_loop body_graph")
    c_outs = _sub_out_types(cond_g)
    if len(c_outs) != 1 or tuple(c_outs[0][0]) != () or c_outs[0][1] != "bool":
        raise TypeError(
            f"cond_graph must return a scalar bool, got {c_outs}")
    b_outs = _sub_out_types(body_g)
    state = [(tuple(s), d) for s, d in ins]
    if b_outs != state:
        raise TypeError(
            f"body_graph must preserve state types: {state} vs {b_outs}")
    if len(state) == 1:
        return state[0]
    return list(state)  # tuple value: list of (shape, dtype)


@np_impl("tk.while_loop")
def _while_np(*state, node: Node):
    cond_g = _load_subgraph(node.attrs["cond_graph"])
    body_g = _load_subgraph(node.attrs["body_graph"])
    cur = list(state)
    max_iter = int(node.attrs.get("max_iterations", 1_000_000))
    it = 0
    while bool(np.asarray(_run_sub_np(cond_g, cur)[0]).reshape(())):
        cur = [np.asarray(v) for v in _run_sub_np(body_g, cur)]
        it += 1
        if it >= max_iter:
            raise RuntimeError(f"tk.while_loop exceeded {max_iter} iterations")
    return cur[0] if len(cur) == 1 else cur


@jax_impl("tk.while_loop")
def _while_jax(*state, node: Node):
    import jax.numpy as jnp
    from jax import lax

    cond_fn = _make_sub_jax(_load_subgraph(node.attrs["cond_graph"]))
    body_fn = _make_sub_jax(_load_subgraph(node.attrs["body_graph"]))

    def cond(carry):
        return jnp.asarray(cond_fn(carry)[0]).reshape(())

    def body(carry):
        outs = body_fn(carry)
        return tuple(jnp.asarray(o, dtype=c.dtype)
                     for o, c in zip(outs, carry))

    out = lax.while_loop(cond, body, tuple(jnp.asarray(s) for s in state))
    return out[0] if len(out) == 1 else list(out)
