"""JAX executor — compiles a whole graph into ONE jitted XLA program.

The TPU-native replacement for the reference's graph executor
(`src/runtime/graph_executor/graph_executor.cc:61 Run` — a host-side loop
binding one PackedFunc per node).  Here there is no per-op dispatch at run
time: the topological walk happens once at trace time, XLA fuses and schedules
the whole model, and a single device program executes it.  Per-op
observability (for traces/profiling) is recovered by declaring intermediate
node outputs as program outputs instead of re-dispatching ops one by one.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import numpy as np

from ..utils import dtypes as dt

from ..ir.graph import CONST, TUPLE, TUPLE_GET_ITEM, VAR, Graph
from ..ir.infer import infer_types
from ..ir.registry import get_op


class JaxExecutor:
    """Executes a Graph via jax.jit.

    Parameters are passed to jit as arguments (not baked in as constants) so
    recompiles don't trigger on parameter updates and the compile cache keys
    only on graph structure — the analog of the reference's TE-compiler cache
    keyed by structural hash (`src/relay/backend/te_compiler.cc:136`).
    """

    def __init__(
        self,
        graph: Graph,
        capture: Sequence[str] | None = None,
        device=None,
        donate_inputs: bool = False,
        fuse: bool = False,
    ):
        import sys

        import jax

        from ..ops import jax_ops  # noqa: F401  (registers jax impls, enables x64)

        # deep graphs (ResNet-50 with inline Pallas kernels) exceed the
        # default python recursion limit during jax tracing
        if sys.getrecursionlimit() < 100000:
            sys.setrecursionlimit(100000)

        g = graph
        if fuse:
            from .fuse import fuse_qnn

            g = fuse_qnn(g)
        if any(n.shape is None and n.dtype != "tuple" for n in g.nodes):
            g = infer_types(g)
        self.graph = g
        self.capture = list(capture) if capture is not None else list(g.outputs)
        self._var_names = [n.name for n in g.inputs]
        self.device = device

        param_names = sorted(g.params)
        self._param_names = param_names
        params_np = {k: dt.c_contig(g.params[k]) for k in param_names}
        self._params = {
            k: jax.device_put(v, device) if device is not None else jax.device_put(v)
            for k, v in params_np.items()
        }

        def run_fn(params: dict, inputs: dict):
            env: dict[str, Any] = {}
            for node in g.nodes:
                if node.op == VAR:
                    env[node.name] = inputs[node.name]
                elif node.op == CONST:
                    env[node.name] = params[node.name]
                elif node.op == TUPLE:
                    env[node.name] = [env[i] for i in node.inputs]
                elif node.op == TUPLE_GET_ITEM:
                    env[node.name] = env[node.inputs[0]][int(node.attrs["index"])]
                else:
                    op = get_op(node.op)
                    if op.jax_impl is None:
                        raise NotImplementedError(f"op {node.op} has no jax impl")
                    env[node.name] = op.jax_impl(*[env[i] for i in node.inputs], node=node)
            return [env[name] for name in self.capture]

        self._run_fn = run_fn
        self._jitted = jax.jit(run_fn)

    # -- public API ---------------------------------------------------------
    def make_jit_fn(self):
        """(fn, params) where fn(params, inputs_dict) -> list of outputs.

        fn is the raw TRACEABLE graph function (for jit/grad/shard_map
        composition) — calling it OUTSIDE a jit executes the graph eagerly,
        one op dispatch at a time (measured 500x slower over a tunneled
        device).  For a dispatch loop, wrap it: `jax.jit(fn)` (or use
        run_device, which dispatches the pre-jitted program)."""
        return self._run_fn, self._params

    def run(self, inputs) -> list[np.ndarray]:
        outs = self.run_device(inputs)
        return [np.asarray(o) for o in outs]

    def run_device(self, inputs):
        """Run and return device arrays (no host transfer)."""
        inputs = self._normalize(inputs)
        return self._jitted(self._params, inputs)

    def _normalize(self, inputs) -> dict:
        if isinstance(inputs, np.ndarray) or (
            hasattr(inputs, "shape") and hasattr(inputs, "dtype")
        ):
            inputs = [inputs]  # single (numpy or jax) array
        if not isinstance(inputs, Mapping):
            assert len(self._var_names) == len(inputs), (
                f"expected {len(self._var_names)} inputs, got {len(inputs)}"
            )
            inputs = dict(zip(self._var_names, inputs))
        missing = [v for v in self._var_names if v not in inputs]
        if missing:
            raise KeyError(f"graph inputs not provided: {missing}")
        return {k: inputs[k] for k in self._var_names}

    def lower_text(self, inputs) -> str:
        """StableHLO text of the compiled program (debug/inspection aid —
        the analog of the reference's `lib.get_source()`)."""
        import jax

        inputs = self._normalize(inputs)
        return jax.jit(self._run_fn).lower(self._params, inputs).as_text()


def run_graph_jax(graph: Graph, inputs, capture=None) -> list[np.ndarray]:
    return JaxExecutor(graph, capture=capture).run(inputs)


def computational_nodes(graph: Graph) -> list[str]:
    """Names of all op nodes (the per-op trace capture set)."""
    return [
        n.name
        for n in graph.nodes
        if n.op not in (VAR, CONST, TUPLE, TUPLE_GET_ITEM)
    ]
