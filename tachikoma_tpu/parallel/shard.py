"""Sharded graph execution — dp (batch) x tp (channel) partitioning via GSPMD.

The TPU-native replacement for the reference's distribution story (SURVEY.md
§2.5): where TVM has only an inference pipeline executor and RPC device pools,
here the whole integer graph is ONE pjit program over a `Mesh`; sharding
annotations on inputs/params make XLA's GSPMD partitioner insert the
collectives (int32 partial sums reduce with psum over 'tp', batch stays
data-parallel over 'dp').  No NCCL/MPI translation — the data plane is ICI
collectives chosen by the compiler.

Sharding rules (NHWC / HWIO / (K,N) layouts):
  graph inputs      : batch axis -> 'dp'
  conv weights HWIO : output-channel axis -> 'tp'
  dense weights KN  : N -> 'tp'
  biases / scales   : channel -> 'tp'
GSPMD propagates activation shardings; channel-partitioned qnn.conv2d feeding
a channel-summing op yields int32 psum over 'tp' (BASELINE's north star).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from ..utils import dtypes as dt

from ..ir.graph import Graph
from ..ir.infer import infer_types


def default_param_spec(name: str, arr: np.ndarray, mesh) -> "object":
    """Choose a PartitionSpec for a parameter (channel-split over 'tp')."""
    from jax.sharding import PartitionSpec as P

    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    tp = axes.get("tp", 1)
    # only shard true weight matrices: splitting 1-D scale/bias/norm vectors
    # buys nothing and forces all-gathers at their (elementwise) use sites
    if tp > 1 and arr.ndim >= 2 and arr.shape[-1] % tp == 0 and arr.shape[-1] >= tp:
        return P(*([None] * (arr.ndim - 1) + ["tp"]))
    return P()


def default_input_spec(shape, mesh) -> "object":
    from jax.sharding import PartitionSpec as P

    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    dp = axes.get("dp", 1)
    if dp > 1 and len(shape) >= 1 and shape[0] % dp == 0:
        return P(*(["dp"] + [None] * (len(shape) - 1)))
    return P()


class ShardedExecutor:
    """Run a Graph as one GSPMD-partitioned XLA program over a mesh."""

    def __init__(
        self,
        graph: Graph,
        mesh,
        param_specs: Mapping[str, object] | None = None,
        input_specs: Mapping[str, object] | None = None,
        capture=None,
    ):
        import jax
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from ..ops import jax_ops  # noqa: F401
        from ..runtime.executor import JaxExecutor

        g = graph
        if any(n.shape is None and n.dtype != "tuple" for n in g.nodes):
            g = infer_types(g)
        self.graph = g
        self.mesh = mesh

        base = JaxExecutor(g, capture=capture)
        run_fn, _ = base.make_jit_fn()
        self._var_names = [n.name for n in g.inputs]

        pspecs = dict(param_specs or {})
        params = {}
        for name in sorted(g.params):
            arr = dt.c_contig(g.params[name])
            spec = pspecs.get(name, default_param_spec(name, arr, mesh))
            params[name] = jax.device_put(arr, NamedSharding(mesh, spec))
        self._params = params

        ispecs = dict(input_specs or {})
        self._input_shardings = {}
        for n in g.inputs:
            spec = ispecs.get(n.name, default_input_spec(n.shape, mesh))
            self._input_shardings[n.name] = NamedSharding(mesh, spec)

        self._jitted = jax.jit(run_fn)
        self._normalize = base._normalize

    def run_device(self, inputs):
        import jax

        inputs = self._normalize(inputs)
        placed = {
            k: jax.device_put(np.asarray(v), self._input_shardings[k])
            for k, v in inputs.items()
        }
        return self._jitted(self._params, placed)

    def run(self, inputs) -> list[np.ndarray]:
        return [np.asarray(o) for o in self.run_device(inputs)]
