"""Exact reference interpreter (numpy, CPU).

The semantic ground truth every backend must match bit-for-bit on integer
graphs — the role of the reference's Relay interpreter
(`src/relay/backend/interpreter.cc:297`, EvalFunction at `:1135`), minus the
IR machinery: a single topological walk dispatching to each op's registered
numpy oracle implementation.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence

import numpy as np

from ..ir.graph import CONST, TUPLE, TUPLE_GET_ITEM, VAR, Graph
from ..ir.infer import infer_types
from ..ir.registry import get_op


class Interpreter:
    def __init__(self, graph: Graph):
        self.graph = infer_types(graph) if any(n.shape is None and n.dtype != "tuple" for n in graph.nodes) else graph

    def run(
        self,
        inputs: Mapping[str, np.ndarray] | Sequence[np.ndarray] | np.ndarray,
        intercept: Callable[[str, str, list[np.ndarray], np.ndarray], None] | None = None,
    ) -> list[np.ndarray]:
        """Execute the graph; `intercept(node_name, op, inputs, output)` is the
        hook the trace emitter and the calibrator attach to (the role of the
        debug graph executor's per-node dump,
        `src/runtime/graph_executor/debug/graph_executor_debug.cc:296`)."""
        g = self.graph
        env: dict[str, Any] = {}
        if isinstance(inputs, np.ndarray):
            inputs = [inputs]
        if not isinstance(inputs, Mapping):
            var_names = [n.name for n in g.inputs]
            assert len(var_names) == len(inputs), f"expected {len(var_names)} inputs"
            inputs = dict(zip(var_names, inputs))
        for node in g.nodes:
            if node.op == VAR:
                v = np.asarray(inputs[node.name])
                if node.dtype is not None and str(v.dtype) != node.dtype:
                    v = v.astype(node.dtype)
                if node.shape is not None and tuple(v.shape) != tuple(node.shape):
                    raise ValueError(
                        f"input {node.name}: expected shape {node.shape}, got {v.shape}"
                    )
                env[node.name] = v
            elif node.op == CONST:
                env[node.name] = g.params[node.name]
            elif node.op == TUPLE:
                env[node.name] = [env[i] for i in node.inputs]
            elif node.op == TUPLE_GET_ITEM:
                env[node.name] = env[node.inputs[0]][int(node.attrs["index"])]
            else:
                op = get_op(node.op)
                if op.np_impl is None:
                    raise NotImplementedError(f"op {node.op} has no numpy oracle impl")
                args = [env[i] for i in node.inputs]
                out = op.np_impl(*args, node=node)
                if isinstance(out, np.ndarray) and node.shape is not None:
                    if tuple(out.shape) != tuple(node.shape) or str(out.dtype) != node.dtype:
                        raise AssertionError(
                            f"{node.name} ({node.op}): inferred {node.dtype}{node.shape} "
                            f"but computed {out.dtype}{out.shape}"
                        )
                env[node.name] = out
                if intercept is not None:
                    intercept(node.name, node.op, args, out)
        return [env[o] for o in g.outputs]


def run_graph(graph: Graph, inputs, intercept=None) -> list[np.ndarray]:
    return Interpreter(graph).run(inputs, intercept=intercept)
