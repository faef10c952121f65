"""Dispatch-time specialization for data-dependent shapes (`dyn.*`).

XLA compiles static shapes only, so a graph whose output shape depends on a
tensor VALUE (dyn.reshape from an input tensor) cannot be one compiled
program.  The TPU-native answer is the one JAX itself uses for new shapes:
specialize + cache.  At dispatch time this executor

  1. concrete-folds each dyn op's shape-feeding subgraph with the numpy
     oracle on the actual inputs (tiny: shape tensors and their ancestors),
  2. rewrites `dyn.reshape` -> static `reshape` (the DynamicToStatic pass
     of the reference, `src/relay/transforms/dynamic_to_static.cc`,
     performed per concrete shape instead of failing when the shape is not
     a constant),
  3. infers/compiles the static graph and caches it keyed by the folded
     shapes — repeat calls with the same dynamic shapes are pure cache hits
     (the role of the Relay VM's runtime shape functions,
     `src/runtime/vm/vm.h:262`, without a bytecode interpreter on the
     device path).

Bounded dyn ops (dyn.nonzero) need no specialization — their padded
outputs are static — so they compile directly on every backend.
"""

from __future__ import annotations

import numpy as np

from ..ir.graph import CONST, TUPLE, TUPLE_GET_ITEM, VAR, Graph
from ..ir.infer import infer_types
from ..ir.registry import get_op
from ..ops.dyn import DYN_FOLDERS, fold_to_static


def has_dynamic_shapes(graph: Graph) -> bool:
    return any(n.op in DYN_FOLDERS for n in graph.nodes)


def _eval_subset(graph: Graph, targets: set, feeds: dict) -> dict:
    """Oracle-evaluate only `targets` and their ancestors."""
    need: set = set()
    stack = list(targets)
    while stack:
        nm = stack.pop()
        if nm in need:
            continue
        need.add(nm)
        stack.extend(graph[nm].inputs)
    env: dict = {}
    for n in graph.nodes:
        if n.name not in need:
            continue
        if n.op == VAR:
            env[n.name] = np.asarray(feeds[n.name])
        elif n.op == CONST:
            env[n.name] = graph.params[n.name]
        elif n.op == TUPLE:
            env[n.name] = [env[i] for i in n.inputs]
        elif n.op == TUPLE_GET_ITEM:
            env[n.name] = env[n.inputs[0]][int(n.attrs["index"])]
        else:
            op = get_op(n.op)
            env[n.name] = op.np_impl(*[env[i] for i in n.inputs], node=n)
    return {t: env[t] for t in targets}


def specialize(graph: Graph, inputs) -> tuple[Graph, tuple]:
    """(static graph, shape key) for the concrete `inputs`.

    Every dyn.* node becomes its STATIC twin (reshape/tile/broadcast_to/
    full/one_hot/strided_slice/topk) via the fold registry it shares with
    the oracle and JAX impls (`ops/dyn.py DYN_FOLDERS`); the shape-feeding
    nodes die by DCE if nothing else uses them."""
    if isinstance(inputs, np.ndarray):
        inputs = [inputs]
    if not isinstance(inputs, dict):
        inputs = dict(zip([n.name for n in graph.inputs], inputs))
    dyn_nodes = [n for n in graph.nodes if n.op in DYN_FOLDERS]
    if not dyn_nodes:
        return graph, ()
    shape_srcs = {n.inputs[p] for n in dyn_nodes
                  for p in DYN_FOLDERS[n.op][0]}
    vals = _eval_subset(graph, shape_srcs, inputs)
    new_nodes = []
    key = []
    for n in graph.nodes:
        if n.op in DYN_FOLDERS:
            positions, _ = DYN_FOLDERS[n.op]
            folded = [vals[n.inputs[p]] for p in positions]
            n2, _ = fold_to_static(n, folded)
            key.append((n.name, tuple(
                tuple(np.asarray(v).ravel().tolist()) for v in folded)))
            new_nodes.append(n2)
        else:
            new_nodes.append(n)
    g = Graph(new_nodes, list(graph.outputs), dict(graph.params),
              graph.name).dead_code_eliminate()
    return infer_types(g), tuple(key)


class DynShapeExecutor:
    """Run graphs containing dyn.* shape-from-tensor ops on any backend by
    per-shape specialization with caching."""

    def __init__(self, graph: Graph, backend: str = "jax"):
        self.graph = graph
        self.backend = backend
        self._cache: dict = {}

    def run(self, inputs) -> list[np.ndarray]:
        g, key = specialize(self.graph, inputs)
        entry = self._cache.get(key)
        if entry is None:
            self._cache[key] = entry = g
        if self.backend == "oracle":
            from .interpreter import run_graph

            return run_graph(entry, inputs)
        from .executor import run_graph_jax

        return run_graph_jax(entry, inputs)
