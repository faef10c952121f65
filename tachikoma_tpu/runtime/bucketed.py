"""Shape-bucket executor — dynamic batch sizes on a static-shape compiler.

The role of the reference's Relay VM for dynamic models
(`/root/reference/src/runtime/vm/vm.h:262` RunLoop over bytecode with
runtime shape resolution): XLA requires static shapes, so dynamic batch is
realized by re-jitting the graph once per SHAPE BUCKET and padding inputs up
to the bucket (outputs are sliced back).  A bucket's executor compiles once
and is cached; repeated calls at any batch size <= max(buckets) never
retrace.  This is the "re-jit per shape bucket" policy PARITY §2.1 names.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np

from ..ir.graph import VAR, Graph
from ..ir.infer import infer_types
from .executor import JaxExecutor

_DEFAULT_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


class BucketedExecutor:
    """Runs a graph at any batch size along `axis` of every input var.

    Policy: pick the smallest bucket >= batch, zero-pad inputs to it, run
    the cached bucket executor, slice every output back to the true batch
    (all outputs are assumed batch-major on `axis`).  Batches larger than
    the biggest bucket get an exact-size executor (compiled + cached too).
    """

    def __init__(self, graph: Graph, axis: int = 0,
                 buckets: Sequence[int] | None = None, fuse: bool = False):
        self.template = infer_types(graph)
        self.axis = axis
        self.buckets = tuple(sorted(buckets or _DEFAULT_BUCKETS))
        self.fuse = fuse
        self._cache: dict[int, JaxExecutor] = {}
        self._var_names = [n.name for n in self.template.inputs]

    # -- internals -----------------------------------------------------------

    def _graph_for(self, b: int) -> Graph:
        nodes = []
        for n in self.template.nodes:
            if n.op == VAR:
                shape = list(n.shape)
                shape[self.axis] = b
                nodes.append(n.with_(shape=tuple(shape)))
            else:
                # drop stale inferred types; infer_types refills
                nodes.append(n.with_(shape=None, dtype=None) if n.op != "const"
                            else n)
        g = Graph(nodes, list(self.template.outputs),
                  dict(self.template.params), self.template.name)
        return infer_types(g)

    def executor_for(self, b: int) -> JaxExecutor:
        bucket = next((v for v in self.buckets if v >= b), b)
        ex = self._cache.get(bucket)
        if ex is None:
            ex = JaxExecutor(self._graph_for(bucket), fuse=self.fuse)
            self._cache[bucket] = ex
        return ex

    @property
    def compiled_buckets(self) -> list[int]:
        return sorted(self._cache)

    # -- public API ----------------------------------------------------------

    def run(self, inputs) -> list[np.ndarray]:
        if isinstance(inputs, np.ndarray):
            inputs = [inputs]
        if isinstance(inputs, Mapping):
            inputs = [inputs[v] for v in self._var_names]
        inputs = [np.asarray(x) for x in inputs]
        b = inputs[0].shape[self.axis]
        for x in inputs[1:]:
            if x.shape[self.axis] != b:
                raise ValueError(
                    f"inconsistent batch sizes along axis {self.axis}: "
                    f"{b} vs {x.shape[self.axis]}")
        ex = self.executor_for(b)
        bucket = ex.graph.inputs[0].shape[self.axis]
        if bucket != b:
            padded = []
            for x in inputs:
                pads = [(0, 0)] * x.ndim
                pads[self.axis] = (0, bucket - b)
                padded.append(np.pad(x, pads))
            inputs = padded
        outs = ex.run(inputs)
        if bucket != b:
            for o in outs:
                if o.ndim <= self.axis:
                    # e.g. a scalar loss: the value was computed over the
                    # zero-padded rows and cannot be sliced back — padding
                    # would silently corrupt it
                    raise ValueError(
                        f"bucketed output of rank {o.ndim} has no batch "
                        f"axis {self.axis}; outputs that aggregate over the "
                        "batch are not paddable — run at an exact bucket "
                        f"size (buckets={self.buckets})")
            outs = [o[tuple(
                slice(0, b) if d == self.axis else slice(None)
                for d in range(o.ndim))] for o in outs]
        return outs
