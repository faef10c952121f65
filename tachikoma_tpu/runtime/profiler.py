"""Per-op profiler + report.

The role of the reference's debug graph executor (`RunIndividual`,
`src/runtime/graph_executor/debug/graph_executor_debug.cc:70`) and profiling
report (`include/tvm/runtime/profiling.h:259 Report`): time every op, produce
a table/CSV/JSON report with FLOP-derived throughput and roofline fractions.

Two modes:
  * per_op: each op jitted and timed individually (dispatch-inflated but
    attributable — like RunIndividual);
  * whole_graph: one jitted program timed end-to-end (what production sees).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from typing import Sequence

import numpy as np

from ..ir.graph import CONST, TUPLE, TUPLE_GET_ITEM, VAR, Graph
from ..ir.infer import infer_types
from ..ir.registry import get_op

# Peak numbers for roofline fractions (per chip).
PEAKS = {
    "tpu v5 lite": {"int8_ops": 394.7e12, "bf16_flops": 197.4e12, "hbm_gbps": 819.0},
    "cpu": {"int8_ops": 1e12, "bf16_flops": 5e11, "hbm_gbps": 50.0},
}


@dataclass
class OpProfile:
    name: str
    op: str
    shape: tuple
    dtype: str
    time_s: float
    flops: int
    bytes: int

    @property
    def gops(self) -> float:
        return self.flops / self.time_s / 1e9 if self.time_s > 0 else 0.0


@dataclass
class Report:
    entries: list[OpProfile]
    total_time_s: float
    whole_graph_time_s: float | None = None
    device: str = ""

    def table(self, top: int | None = None) -> str:
        rows = sorted(self.entries, key=lambda e: -e.time_s)
        if top:
            rows = rows[:top]
        out = [
            f"{'name':<28} {'op':<18} {'time_ms':>9} {'%':>6} {'GOPS':>9} {'shape'}"
        ]
        for e in rows:
            pct = 100 * e.time_s / self.total_time_s if self.total_time_s else 0
            out.append(
                f"{e.name[:28]:<28} {e.op[:18]:<18} {e.time_s*1e3:>9.3f} "
                f"{pct:>6.1f} {e.gops:>9.1f} {e.dtype}{list(e.shape)}"
            )
        out.append(
            f"total per-op {self.total_time_s*1e3:.3f} ms"
            + (
                f"; whole-graph {self.whole_graph_time_s*1e3:.3f} ms"
                if self.whole_graph_time_s is not None
                else ""
            )
        )
        return "\n".join(out)

    def csv(self) -> str:
        lines = ["name,op,time_ms,flops,gops,dtype,shape"]
        for e in self.entries:
            lines.append(
                f"{e.name},{e.op},{e.time_s*1e3:.6f},{e.flops},{e.gops:.2f},"
                f"{e.dtype},{'x'.join(map(str, e.shape))}"
            )
        return "\n".join(lines)

    def json(self) -> str:
        return json.dumps(
            {
                "device": self.device,
                "total_time_ms": self.total_time_s * 1e3,
                "whole_graph_time_ms": (
                    self.whole_graph_time_s * 1e3 if self.whole_graph_time_s else None
                ),
                "ops": [
                    {
                        "name": e.name, "op": e.op, "time_ms": e.time_s * 1e3,
                        "flops": e.flops, "gops": round(e.gops, 2),
                        "dtype": e.dtype, "shape": list(e.shape),
                    }
                    for e in self.entries
                ],
            }
        )


def _op_flops(node, in_types) -> int:
    od = get_op(node.op)
    if od.flops is not None:
        try:
            return int(od.flops(node, in_types))
        except Exception:
            return 0
    return 0


def profile_graph(
    graph: Graph, inputs, repeats: int = 5, whole_graph: bool = True, fuse: bool = False
) -> Report:
    import jax

    from .executor import JaxExecutor

    g = graph
    if fuse:
        from .fuse import fuse_qnn

        g = fuse_qnn(g)
    g = infer_types(g) if any(n.shape is None and n.dtype != "tuple" for n in g.nodes) else g

    # gather concrete values for every node via the capture executor
    from .executor import computational_nodes

    names = computational_nodes(g)
    ex = JaxExecutor(g, capture=names)
    outs = ex.run_device(inputs)
    values = dict(zip(names, outs))
    # structural values
    inputs_n = ex._normalize(inputs)
    env = {}
    for n in g.nodes:
        if n.op == VAR:
            env[n.name] = jax.device_put(np.asarray(inputs_n[n.name], dtype=n.dtype))
        elif n.op == CONST:
            env[n.name] = ex._params[n.name]
        elif n.op in (TUPLE, TUPLE_GET_ITEM):
            env[n.name] = None
        else:
            env[n.name] = values[n.name]

    entries = []
    for n in g.nodes:
        if n.op in (VAR, CONST, TUPLE, TUPLE_GET_ITEM):
            continue
        od = get_op(n.op)
        if od.jax_impl is None:
            continue
        args = [env[i] for i in n.inputs]
        if any(a is None for a in args):
            continue
        fn = jax.jit(lambda *a, _n=n, _f=od.jax_impl: _f(*a, node=_n))
        try:
            r = fn(*args)
            jax.block_until_ready(r)
        except Exception:
            continue
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        in_types = [(tuple(np.shape(a)), str(np.asarray(a).dtype) if not hasattr(a, "dtype") else str(a.dtype)) for a in args]
        nbytes = sum(int(np.prod(np.shape(a))) * np.dtype(
            str(a.dtype) if hasattr(a, "dtype") else "float32").itemsize for a in args)
        entries.append(
            OpProfile(
                n.name, n.op, tuple(n.shape or ()), n.dtype or "?", best,
                _op_flops(n, in_types), nbytes,
            )
        )

    total = sum(e.time_s for e in entries)
    wg = None
    if whole_graph:
        ex2 = JaxExecutor(g)
        ex2.run(inputs)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            outs = ex2.run_device(inputs)
            jax.block_until_ready(outs)
            best = min(best, time.perf_counter() - t0)
        wg = best
    dev = str(jax.devices()[0])
    return Report(entries, total, wg, dev)
