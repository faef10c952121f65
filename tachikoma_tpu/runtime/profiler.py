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


def graph_flops(graph: Graph) -> int:
    """Static total op count of a graph (2*MACs for matmul-family ops) from
    the per-op flops registry — the denominator for e2e MFU reporting.
    Requires inferred shapes (runs infer_types if any are missing)."""
    g = graph
    if any(n.shape is None and n.dtype != "tuple" for n in g.nodes):
        g = infer_types(g)
    total = 0
    for n in g.nodes:
        if n.op in (VAR, CONST, TUPLE, TUPLE_GET_ITEM):
            continue
        in_types = [(tuple(g[i].shape or ()), g[i].dtype or "float32")
                    for i in n.inputs]
        total += _op_flops(n, in_types)
    return total


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


# ---------------------------------------------------------------------------
# cut-point ablation — honest in-context attribution
# ---------------------------------------------------------------------------

@dataclass
class AblationEntry:
    label: str            # cut node name
    n_ops: int            # ops in this stage (since the previous cut)
    cumulative_s: float   # e2e latency of the graph truncated at this cut
    delta_s: float        # cumulative[k] - cumulative[k-1]


@dataclass
class AblationReport:
    entries: list
    device: str

    def table(self) -> str:
        rows = [f"{'cut':<40} {'ops':>5} {'cum ms':>10} {'delta ms':>10}"]
        for e in self.entries:
            rows.append(f"{e.label:<40} {e.n_ops:>5} "
                        f"{e.cumulative_s*1e3:>10.3f} {e.delta_s*1e3:>10.3f}")
        rows.append(f"device: {self.device}")
        return "\n".join(rows)

    def csv(self) -> str:
        out = ["cut,ops,cumulative_ms,delta_ms"]
        for e in self.entries:
            out.append(f"{e.label},{e.n_ops},{e.cumulative_s*1e3:.4f},"
                       f"{e.delta_s*1e3:.4f}")
        return "\n".join(out)

    def json(self) -> str:
        return json.dumps({
            "device": self.device,
            "entries": [
                {"cut": e.label, "ops": e.n_ops,
                 "cumulative_ms": round(e.cumulative_s * 1e3, 4),
                 "delta_ms": round(e.delta_s * 1e3, 4)}
                for e in self.entries],
        })


def ablate_graph(graph: Graph, inputs, cuts: Sequence[str] | None = None,
                 repeats: int = 3, fuse: bool = False,
                 min_ops: int = 24, max_ops: int = 400) -> AblationReport:
    """Cumulative-latency ablation at cut points INSIDE the compiled-context
    regime: time the graph truncated at each cut; consecutive differences
    give per-stage costs that include fusion/overlap effects.

    This is the honest attribution surface: the isolated per-op mode
    (profile_graph) mispredicts in-context cost by ~2x in both directions
    (measured on v5e: ResNet-50 sum-of-parts 7.9 ms vs 4.4 ms e2e; a
    1.8 ms isolated maxpool that is ~free in context).  The reference's
    debug executor (RunIndividual, graph_executor_debug.cc:70) has the same
    blind spot — this mode replaces it rather than porting it.

    cuts=None picks the single-tensor articulation points the segmented
    executor partitions at (runtime/segmented.py).
    """
    import jax

    from ..utils.timing import per_iter_chain
    from .executor import JaxExecutor

    g = graph
    if fuse:
        from .fuse import fuse_qnn

        g = fuse_qnn(g)
    g = infer_types(g) if any(
        n.shape is None and n.dtype != "tuple" for n in g.nodes) else g

    if cuts is None:
        from .segmented import partition

        segs = partition(g, min_ops=min_ops, max_ops=max_ops)
        cuts = [seg[-1].name for seg in segs]
        if cuts and cuts[-1] not in g.outputs:
            cuts[-1] = g.outputs[0]
    cuts = list(cuts)

    op_pos = {n.name: i for i, n in enumerate(g.nodes)}

    entries = []
    prev_t = 0.0
    prev_ops = 0
    for cut in cuts:
        sub = Graph(list(g.nodes), [cut], params=dict(g.params),
                    name=g.name).dead_code_eliminate()
        n_ops = sum(1 for n in sub.nodes
                    if n.op not in (VAR, CONST, TUPLE, TUPLE_GET_ITEM))
        ex = JaxExecutor(sub)
        fn0, params = ex.make_jit_fn()
        vnames = [n.name for n in sub.inputs]
        x0 = ex._normalize(inputs if not isinstance(inputs, dict) else {
            k: inputs[k] for k in vnames})
        first = vnames[0]
        rest = {k: jax.device_put(np.asarray(v)) for k, v in x0.items()
                if k != first}

        def fn(a, _f=fn0, _p=params, _r=rest, _v=first):
            return _f(_p, {_v: a, **_r})[0]

        if np.dtype(sub[first].dtype).kind in "iu":
            def feedback(a, out):
                import jax.numpy as jnp

                bump = (out.astype(jnp.float32).sum() > 1e30)
                return a + bump.astype(a.dtype)
        else:
            def feedback(a, out):
                import jax.numpy as jnp

                return a + out.astype(jnp.float32).sum().astype(a.dtype) * 1e-30

        t = per_iter_chain(fn, jax.device_put(np.asarray(x0[first])),
                           feedback, scan_len=4, repeats=repeats,
                           target_s=0.05)
        entries.append(AblationEntry(cut, n_ops - prev_ops, t, t - prev_t))
        prev_t, prev_ops = t, n_ops

    dev = str(jax.devices()[0])
    del op_pos
    return AblationReport(entries, dev)
