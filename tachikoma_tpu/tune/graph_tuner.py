"""Graph-level tuning — whole-graph config search measured end-to-end.

The role of the reference's graph tuner
(`python/tvm/autotvm/graph_tuner/`: optimize layout-transition choices
across the WHOLE graph instead of per-workload), rebuilt on the lesson that
motivated it here: per-workload records mispredict in-context cost
(RESULTS.md: sum-of-parts 7.9 ms vs 4.4 ms e2e on ResNet-50), so the only
honest objective is the measured end-to-end latency of the composed graph.

Search space: the graph-level decisions that change how workloads compose —
  * which conv-chain runs actually fuse (fuse.py chains win on average but
    individual runs can lose; the per-run toggle is the graph analog of
    the reference's per-node layout choice);
  * each chain's bn_cap wide-N blocking (when present in the config space).

Strategy: greedy coordinate descent from the all-fused baseline — flip one
decision at a time, re-measure e2e, keep improvements (the graph tuner's
benefit at a fraction of its PBQP machinery; the decision count is small
because chains already collapse runs).  Every measurement records to the
TuneDatabase under graph/<structural-hash> so the best variant is
re-applied like any other history record.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from ..ir.graph import Graph
from .database import NO_ERROR, TuneDatabase, TuneRecord


def chain_runs(fused: Graph) -> list[str]:
    """Names of tk.conv2d_chain nodes in a fused graph (the decisions).
    Chains with a fused residual epilogue (res_add) are excluded — undoing
    them would need the qnn.add re-materialized."""
    return [n.name for n in fused.nodes
            if n.op == "tk.conv2d_chain" and not n.attrs.get("res_add")]


def apply_variant(graph: Graph, fused: Graph, disabled: set[str]) -> Graph:
    """Re-fuse `graph` with the chains in `disabled` split back into their
    member tk.conv2d_rq ops.

    Implemented by re-running fusion with a filter: fuse.py's chain pass is
    deterministic, so the run that produced chain name X in `fused`
    reproduces X; members of disabled runs are left sequential."""
    from ..runtime.fuse import fuse_qnn

    import tachikoma_tpu.runtime.fuse as fuse_mod

    if not disabled:
        return fused
    orig_fn = fuse_mod.fuse_conv_chains

    def filtered(g: Graph) -> Graph:
        full = orig_fn(g)
        if not disabled:
            return full
        # split disabled chains back into sequential conv nodes
        from ..ir.graph import GraphBuilder

        b = GraphBuilder(full.name)
        mapping = {}
        for n in full.nodes:
            if n.is_var:
                mapping[n.name] = b.var(n.name, n.shape, n.dtype)
            elif n.is_const:
                mapping[n.name] = b.const(full.params[n.name], name=n.name)
            elif (n.op == "tk.conv2d_chain" and n.name in disabled
                  and not n.attrs.get("res_add")):
                cur = mapping[n.inputs[0]]
                arg = 1
                for si, st in enumerate(n.attrs["stages"]):
                    ins = [cur, mapping[n.inputs[arg]]]
                    arg += 1
                    attrs = {
                        "strides": (1, 1), "padding": tuple(st["padding"]),
                        "multiplier": st["multiplier"], "shift": st["shift"],
                        "input_zero_point": st.get("input_zero_point", 0),
                        "output_zero_point": st.get("output_zero_point", 0),
                        "rounding": st.get("rounding", "UPWARD"),
                        "out_dtype": "int8",
                    }
                    for k in ("a_min", "a_max"):
                        if k in st:
                            attrs[k] = st[k]
                    if st.get("has_bias"):
                        ins.append(mapping[n.inputs[arg]])
                        arg += 1
                        attrs["has_bias"] = True
                    nm = n.name if si == len(n.attrs["stages"]) - 1 \
                        else f"{n.name}_u{si}"
                    cur = b.call("tk.conv2d_rq", *ins, name=nm, **attrs)
                mapping[n.name] = cur
            else:
                b_ins = [mapping[i] for i in n.inputs]
                mapping[n.name] = b.call(n.op, *b_ins, name=n.name,
                                         **dict(n.attrs))
        from ..ir.infer import infer_types

        return infer_types(b.build([mapping[o] for o in full.outputs]))

    fuse_mod.fuse_conv_chains = filtered
    try:
        return fuse_qnn(graph)
    finally:
        fuse_mod.fuse_conv_chains = orig_fn


@dataclass
class GraphTuneResult:
    best_disabled: list[str]
    best_time_s: float
    baseline_time_s: float
    trials: int


def tune_graph(graph: Graph, measure: Callable[[Graph], float],
               db: TuneDatabase | None = None,
               max_flips: int | None = None,
               improve_eps: float = 0.01,
               verbose: bool = True) -> GraphTuneResult:
    """Greedy coordinate descent over chain-run decisions.

    graph: the QUANTIZED (unfused) graph; measure(fused_graph) -> e2e
    seconds (injectable: the TPU harness passes a per_iter_chain measurer,
    tests pass a stub).  Returns the winning disabled-set; apply with
    apply_variant(graph, fused, set(best_disabled))."""
    from ..runtime.fuse import fuse_qnn

    fused = fuse_qnn(graph)
    decisions = chain_runs(fused)
    wl = f"graph/{graph.structural_hash()[:16]}"

    def record(disabled, t):
        if db is not None:
            db.add(TuneRecord(wl, {"disabled_chains": sorted(disabled)},
                              t * 1e3, NO_ERROR, ""))

    base_t = measure(fused)
    record(set(), base_t)
    if verbose:
        print(f"graph-tune baseline ({len(decisions)} chains): "
              f"{base_t*1e3:.3f} ms", flush=True)
    best_t, best_dis = base_t, set()
    trials = 1
    budget = max_flips if max_flips is not None else len(decisions)
    for name in decisions[:budget]:
        cand = best_dis ^ {name}
        g = apply_variant(graph, fused, cand)
        t = measure(g)
        trials += 1
        record(cand, t)
        if verbose:
            print(f"graph-tune flip {name}: {t*1e3:.3f} ms "
                  f"({'keep' if t < best_t * (1 - improve_eps) else 'revert'})",
                  flush=True)
        if t < best_t * (1 - improve_eps):
            best_t, best_dis = t, cand
    return GraphTuneResult(sorted(best_dis), best_t, base_t, trials)
