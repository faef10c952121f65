"""Shape/dtype inference pass.

The static-typing backbone: every node gets a concrete (shape, dtype) before
execution or lowering — the role of Relay's type inference
(`src/relay/analysis/type_solver.cc`) collapsed to a single forward walk,
which suffices because the IR has no polymorphism and static shapes only
(XLA requirement anyway).
"""

from __future__ import annotations

from typing import Sequence

from .graph import CONST, TUPLE, TUPLE_GET_ITEM, VAR, Graph, GraphError, Node
from .registry import TensorType, get_op


class TypeError_(GraphError):
    pass


def infer_types(graph: Graph) -> Graph:
    """Return a new Graph with every node's shape/dtype filled in."""
    types: dict[str, TensorType | list[TensorType]] = {}
    new_nodes: list[Node] = []
    for node in graph.nodes:
        if node.op == VAR:
            if node.shape is None or node.dtype is None:
                raise TypeError_(f"input var {node.name} must have shape and dtype")
            ty: TensorType | list[TensorType] = (tuple(node.shape), node.dtype)
        elif node.op == CONST:
            arr = graph.params[node.name]
            ty = (tuple(arr.shape), str(arr.dtype))
        elif node.op == TUPLE:
            ty = [_scalar_ty(types[i], i) for i in node.inputs]
        elif node.op == TUPLE_GET_ITEM:
            src = types[node.inputs[0]]
            if not isinstance(src, list):
                raise TypeError_(f"{node.name}: tuple_get_item on non-tuple")
            ty = src[int(node.attrs["index"])]
        else:
            op = get_op(node.op)
            if op.infer is None:
                raise TypeError_(f"op {node.op} has no type relation")
            in_types = [_scalar_ty(types[i], i) for i in node.inputs]
            try:
                ty = op.infer(node, in_types)
            except TypeError_:
                raise
            except Exception as e:
                raise TypeError_(f"type inference failed at {node.name} ({node.op}): {e}") from e
        types[node.name] = ty
        if isinstance(ty, list):
            new_nodes.append(node.with_(shape=None, dtype="tuple"))
        else:
            shape, dtype = ty
            # shape None = data-dependent (dyn.* ops, ops/dyn.py): legal at
            # the graph boundary; a downstream consumer's rule will raise
            # here with the node name, pointing at runtime/dynshape.py
            new_nodes.append(node.with_(
                shape=None if shape is None
                else tuple(int(s) for s in shape), dtype=dtype))
    return Graph(new_nodes, list(graph.outputs), dict(graph.params), graph.name)


def _scalar_ty(ty, name: str) -> TensorType:
    if isinstance(ty, list):
        raise TypeError_(f"{name}: tuple value used where tensor expected")
    return ty


def output_types(graph: Graph) -> list[TensorType]:
    g = graph if all(n.shape is not None or n.dtype == "tuple" for n in graph.nodes) else infer_types(graph)
    return [(g[o].shape, g[o].dtype) for o in g.outputs]
