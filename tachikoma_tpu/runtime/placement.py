"""Per-op heterogeneous device placement.

The TPU-native analog of the reference's device planning + heterogeneous
graph execution (`src/relay/transforms/device_planner.cc` — propagating
`on_device` annotations to a per-node device assignment — and the
heterogeneous paths of `src/runtime/graph_executor/graph_executor.cc`).

Here a node opts into a device with the node attr ``device=<int>`` (set at
build time via ``GraphBuilder.annotate`` or by a transform).  ``plan_devices``
propagates the annotations to every node; ``HeterogeneousExecutor`` splits the
graph into maximal same-device segments, jit-compiles one XLA program per
segment, and moves boundary tensors with ``jax.device_put`` — transfers are
explicit and countable, exactly like the reference's cross-device copies.

Within one process the devices are whatever ``jax.devices()`` exposes (8
virtual CPU devices under the test mesh; TPU chips in production), so the
same plan drives CPU-offload layouts (e.g. embedding tables on host) or
multi-chip splits without a mesh.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import numpy as np

from ..utils import dtypes as dt

from ..ir.graph import CONST, TUPLE, TUPLE_GET_ITEM, VAR, Graph
from ..ir.infer import infer_types
from ..ir.registry import get_op


def plan_devices(graph: Graph, default_device: int = 0) -> dict[str, int]:
    """Propagate ``device`` annotations to a total per-node assignment.

    Rules (mirroring the reference's DeviceDomain unification defaults):
      * an annotated node keeps its device;
      * an unannotated node inherits the device of its first annotated
        input (computation stays where its data is);
      * vars/consts with no annotated consumer land on ``default_device``;
      * remaining nodes get ``default_device``.
    """
    assign: dict[str, int] = {}
    for n in graph.nodes:
        d = n.attrs.get("device") if n.attrs else None
        if d is not None:
            assign[n.name] = int(d)
    # forward inheritance: computation follows annotated producers
    for n in graph.nodes:
        if n.name in assign:
            continue
        for i in n.inputs:
            if i in assign:
                assign[n.name] = assign[i]
                break
    # backward: vars/consts follow their first assigned consumer
    users = graph.users()
    for n in graph.nodes:
        if n.name in assign:
            continue
        if n.op in (VAR, CONST):
            for u in users.get(n.name, ()):
                if u in assign:
                    assign[n.name] = assign[u]
                    break
    for n in graph.nodes:
        assign.setdefault(n.name, default_device)
    return assign


def _segments(graph: Graph, plan: Mapping[str, int]) -> list[tuple[int, list]]:
    """Topological split into maximal contiguous same-device runs.

    graph.nodes is already topological; a segment closes when the device
    changes.  Vars/consts are attached to the segment that first uses them.
    """
    segs: list[tuple[int, list]] = []
    cur_dev, cur = None, []
    for n in graph.nodes:
        if n.op in (VAR, CONST):
            continue  # bound as segment inputs below
        d = plan[n.name]
        if cur_dev is None or d == cur_dev:
            cur_dev = d
            cur.append(n)
        else:
            segs.append((cur_dev, cur))
            cur_dev, cur = d, [n]
    if cur:
        segs.append((cur_dev, cur))
    return segs


class HeterogeneousExecutor:
    """Executes a Graph across several devices per a placement plan.

    Each segment compiles to one jitted program; values crossing a segment
    boundary are explicitly ``device_put`` to the consumer's device.  The
    result is bit-identical to the single-device executor (same op impls,
    same order) — only placement and transfers differ.
    """

    def __init__(self, graph: Graph, plan: Mapping[str, int] | None = None,
                 devices: Sequence | None = None, default_device: int = 0):
        import jax

        from ..ops import jax_ops  # noqa: F401  (registers jax impls)

        g = graph
        if any(n.shape is None and n.dtype != "tuple" for n in g.nodes):
            g = infer_types(g)
        self.graph = g
        self.plan = dict(plan) if plan is not None else plan_devices(
            g, default_device)
        self.devices = list(devices) if devices is not None else jax.devices()
        self.segments = _segments(g, self.plan)
        self.transfers = 0  # boundary tensors moved on the last run
        self._var_names = [n.name for n in g.inputs]

        by_name = {n.name: n for n in g.nodes}
        self._const_vals = {
            n.name: jax.device_put(
                dt.c_contig(g.params[n.name]),
                self.devices[self.plan[n.name] % len(self.devices)])
            for n in g.nodes if n.op == CONST
        }

        # per-segment: (jitted fn, input names, node names produced)
        self._compiled = []
        produced: set[str] = set()
        for dev_id, nodes in self.segments:
            names = [n.name for n in nodes]
            need: list[str] = []
            seen = set(names)
            for n in nodes:
                for i in n.inputs:
                    if i not in seen and i not in need:
                        need.append(i)
            seg_nodes = list(nodes)

            def make(seg_nodes=seg_nodes, need=need, names=names):
                def fn(args: dict):
                    env = dict(args)
                    for node in seg_nodes:
                        if node.op == TUPLE:
                            env[node.name] = [env[i] for i in node.inputs]
                        elif node.op == TUPLE_GET_ITEM:
                            env[node.name] = env[node.inputs[0]][
                                int(node.attrs["index"])]
                        else:
                            op = get_op(node.op)
                            env[node.name] = op.jax_impl(
                                *[env[i] for i in node.inputs], node=node)
                    return {m: env[m] for m in names}
                return fn

            self._compiled.append(
                (jax.jit(make()), dev_id, need, names))
            produced.update(names)

    def run_device(self, inputs) -> list:
        import jax

        inputs = self._normalize(inputs)
        env: dict[str, Any] = {}
        env.update(self._const_vals)
        env.update(inputs)
        self.transfers = 0
        for jfn, dev_id, need, names in self._compiled:
            dev = self.devices[dev_id % len(self.devices)]
            args = {}
            for i in need:
                v = env[i]
                if hasattr(v, "devices") and dev not in v.devices():
                    v = jax.device_put(v, dev)
                    self.transfers += 1
                elif not hasattr(v, "devices"):
                    v = jax.device_put(v, dev)
                args[i] = v
            env.update(jfn(args))
        return [env[o] for o in self.graph.outputs]

    def run(self, inputs) -> list[np.ndarray]:
        return [np.asarray(o) for o in self.run_device(inputs)]

    def _normalize(self, inputs) -> dict:
        if isinstance(inputs, np.ndarray) or (
                hasattr(inputs, "shape") and hasattr(inputs, "dtype")):
            inputs = [inputs]
        if not isinstance(inputs, Mapping):
            assert len(self._var_names) == len(inputs)
            inputs = dict(zip(self._var_names, inputs))
        return {k: inputs[k] for k in self._var_names}
