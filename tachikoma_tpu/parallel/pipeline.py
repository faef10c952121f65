"""Pipeline-parallel inference executor.

The TPU-native counterpart of the reference's pipeline executor
(`src/runtime/pipeline/{pipeline_executor.cc,pipeline_scheduler.cc,
spsc_queue.h}`, python `contrib/pipeline_executor.py:37`): a model splits
into N stages placed on N devices; microbatches stream through, and because
JAX dispatch is asynchronous, stage i of microbatch m overlaps stage i+1 of
microbatch m-1 without explicit queues (the runtime's async streams play the
SPSC-queue role).

Stage splitting balances FLOPs over the topological order; cross-boundary
values become stage inputs (the storage the reference plans with
`graph_plan_memory` is simply XLA buffers here).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..ir.graph import CONST, TUPLE, TUPLE_GET_ITEM, VAR, Graph, GraphBuilder
from ..ir.infer import infer_types
from ..ir.registry import get_op


@dataclass
class Stage:
    graph: Graph
    inputs: list[str]     # names (in original graph) this stage consumes
    outputs: list[str]    # names (in original graph) this stage produces


def _node_flops(g: Graph, node) -> int:
    od = get_op(node.op) if node.op not in (VAR, CONST, TUPLE, TUPLE_GET_ITEM) else None
    if od is None or od.flops is None:
        return 1
    try:
        in_types = [(g[i].shape, g[i].dtype) for i in node.inputs]
        return max(int(od.flops(node, in_types)), 1)
    except Exception:
        return 1


def split_stages(graph: Graph, num_stages: int) -> list[Stage]:
    """Partition the graph into contiguous (topological) stages of roughly
    equal FLOPs.  Constants replicate into the stage that uses them."""
    g = infer_types(graph) if any(n.shape is None and n.dtype != "tuple" for n in graph.nodes) else graph
    comp = [n for n in g.nodes if n.op not in (VAR, CONST)]
    flops = [_node_flops(g, n) for n in comp]
    total = sum(flops)
    target = total / num_stages

    # assign each computational node a stage id
    stage_of: dict[str, int] = {}
    acc, sid = 0, 0
    for n, f in zip(comp, flops):
        # close the stage when its budget is met (keep at least one node)
        if acc >= target * (sid + 1) and sid < num_stages - 1:
            sid += 1
        acc += f
        stage_of[n.name] = sid
    num_stages = sid + 1

    stages: list[Stage] = []
    produced_by: dict[str, int] = {}
    for n in g.nodes:
        if n.op == VAR:
            produced_by[n.name] = -1
        elif n.op == CONST:
            produced_by[n.name] = -2  # replicated
        else:
            produced_by[n.name] = stage_of[n.name]

    users = g.users()
    for s in range(num_stages):
        b = GraphBuilder(f"{g.name}_stage{s}")
        mapping: dict[str, str] = {}
        stage_inputs: list[str] = []
        stage_outputs: list[str] = []
        for n in g.nodes:
            owner = produced_by[n.name]
            if owner != s:
                continue  # vars/consts materialize on demand at use sites
            # materialize inputs
            ins = []
            for i in n.inputs:
                if i in mapping:
                    ins.append(mapping[i])
                    continue
                src = g[i]
                if src.is_const:
                    mapping[i] = b.const(g.params[i], name=i)
                else:
                    # produced by an earlier stage or a graph input
                    mapping[i] = b.var(i, src.shape, src.dtype)
                    stage_inputs.append(i)
                ins.append(mapping[i])
            mapping[n.name] = b.call(n.op, *ins, name=n.name, **dict(n.attrs))
            # is this value needed outside the stage?
            needed_out = n.name in g.outputs or any(
                produced_by[u] != s for u in users[n.name]
            )
            if needed_out:
                stage_outputs.append(n.name)
        stages.append(Stage(b.build([mapping[o] for o in stage_outputs]),
                            stage_inputs, stage_outputs))
    return stages


class PipelineExecutor:
    """Run stages on distinct devices with microbatch streaming."""

    def __init__(self, graph: Graph, num_stages: int, devices=None, fuse: bool = False):
        import jax

        from ..runtime.executor import JaxExecutor

        if devices is None:
            devices = jax.devices()
        self.stages = split_stages(graph, num_stages)
        if len(self.stages) > len(devices):
            raise ValueError(
                f"{len(self.stages)} stages need that many devices, have {len(devices)}"
            )
        self.devices = devices[: len(self.stages)]
        self.graph = graph
        self._executors = [
            JaxExecutor(st.graph, device=dev, fuse=fuse)
            for st, dev in zip(self.stages, self.devices)
        ]
        self._graph_outputs = list(graph.outputs)

    def run_microbatches(self, batches: list) -> list[list[np.ndarray]]:
        """Feed a list of microbatch input dicts; returns outputs per batch.
        Dispatch is async: all stages of all microbatches enqueue before the
        first block, so stages overlap across microbatches."""
        import jax

        inflight = []
        for mb in batches:
            env = dict(mb) if isinstance(mb, dict) else {
                self.graph.inputs[0].name: mb
            }
            for st, ex, dev in zip(self.stages, self._executors, self.devices):
                ins = {k: jax.device_put(env[k], dev) for k in st.inputs}
                outs = ex.run_device(ins)
                env.update(dict(zip(st.outputs, outs)))
            inflight.append([env[o] for o in self._graph_outputs])
        return [[np.asarray(o) for o in outs] for outs in inflight]

    def run(self, inputs, num_microbatches: int = 1) -> list[np.ndarray]:
        """Split the batch into microbatches along axis 0, stream, reassemble."""
        if not isinstance(inputs, dict):
            inputs = {self.graph.inputs[0].name: inputs}
        names = list(inputs)
        n = np.shape(inputs[names[0]])[0]
        assert n % num_microbatches == 0
        step = n // num_microbatches
        batches = [
            {k: v[i * step : (i + 1) * step] for k, v in inputs.items()}
            for i in range(num_microbatches)
        ]
        per = self.run_microbatches(batches)
        return [
            np.concatenate([outs[j] for outs in per], axis=0)
            for j in range(len(self._graph_outputs))
        ]
