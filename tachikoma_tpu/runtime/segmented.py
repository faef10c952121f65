"""Segmented executor — graph-as-data execution for deep models.

The whole-graph jit (`runtime/executor.py`) unrolls every layer into ONE
XLA program: a 24-layer ViT-L emits a program ~24x the size of its layer,
paying O(layers) compile time and (over a tunneled device) exceeding remote
compile request caps.  The reference never had this problem because its
graph executor treats the graph as DATA — one compiled function per fused
op, bound per node (`src/runtime/graph_executor/graph_executor.cc:61,466`).

This executor recovers that property TPU-natively:

  * the graph is partitioned into segments at minimal-boundary cut points
    (for transformers these are the single-tensor layer boundaries);
  * each segment compiles as its own small jit program; values flow between
    segments as device arrays (async dispatch pipelines the segment chain,
    so there is no per-segment sync);
  * segments with the same structural hash (alpha-renamed nodes, attrs and
    shapes included, param VALUES excluded — `ir/graph.py structural_bytes`)
    SHARE one compiled program, called with per-segment params: N identical
    float transformer layers compile once (the analog of the reference's
    TE-compiler cache keyed by structural hash, `te_compiler.cc:136`);
  * a run of >= min_scan_layers consecutive same-key segments in a simple
    carry chain is collapsed into ONE `lax.scan` over weights stacked along
    a leading layer axis — the program shrinks by the layer count and the
    scan compiles once regardless of depth.

Bit-exactness: integer ops are exact, so jit boundaries cannot change
values — segmented == whole-graph == oracle, `==` not allclose
(tests/test_segmented.py).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import numpy as np

from ..utils import dtypes as dt

from ..ir.graph import TUPLE, TUPLE_GET_ITEM, VAR, Graph, Node
from ..ir.infer import infer_types
from ..ir.registry import get_op


def partition(g: Graph, min_ops: int = 48, max_ops: int = 640
              ) -> list[list[Node]]:
    """Split the op nodes of ``g`` into consecutive segments.

    Cuts prefer positions where exactly ONE plain tensor crosses the
    boundary (layer boundaries in sequential models); a cut is forced at
    the minimal-crossing position once a segment reaches ``max_ops``.
    Tuple-valued crossings are never allowed (jit boundary values must be
    arrays)."""
    ops = [n for n in g.nodes if not (n.is_var or n.is_const)]
    if not ops:
        return []
    pos = {n.name: i for i, n in enumerate(ops)}
    last_use: dict[str, int] = {}
    for i, n in enumerate(ops):
        for inp in n.inputs:
            if inp in pos:
                last_use[inp] = i

    # crossing[i]: values produced at <= i still needed by an op at > i
    # (graph outputs / captures do not cross: each segment emits its own)
    n_ops = len(ops)
    crossing = [0] * n_ops
    tuple_cross = [False] * n_ops
    open_at: list[list[str]] = [[] for _ in range(n_ops)]
    close_after: list[list[str]] = [[] for _ in range(n_ops)]
    for v, lu in last_use.items():
        open_at[pos[v]].append(v)
        close_after[lu].append(v)
    live: set[str] = set()
    for i in range(n_ops):
        live.update(open_at[i])
        for v in close_after[i]:
            live.discard(v)
        crossing[i] = len(live)
        tuple_cross[i] = any(g[v].dtype == "tuple" for v in live)

    segments: list[list[Node]] = []
    start = 0
    i = 0
    while i < n_ops:
        length = i - start + 1
        if i == n_ops - 1:
            segments.append(ops[start:])
            break
        if length >= min_ops and crossing[i] == 1 and not tuple_cross[i]:
            segments.append(ops[start:i + 1])
            start = i + 1
        elif length >= max_ops:
            # forced cut at the minimal-crossing point in the lookback window
            lo = start + max(min_ops, 1) - 1
            best = None
            for j in range(lo, i + 1):
                if tuple_cross[j]:
                    continue
                if best is None or crossing[j] <= crossing[best]:
                    best = j
            best = i if best is None else best
            segments.append(ops[start:best + 1])
            start = best + 1
            i = best
        i += 1
    return segments


class _Segment:
    """One segment instance: a canonical subgraph plus bindings.

    ``sub`` is a Graph whose node ORDER is a deterministic function of the
    segment's structure (vars/consts inserted at first use), so isomorphic
    segments produce identical ``structural_bytes`` and positionally
    corresponding nodes."""

    __slots__ = ("sub", "key", "in_names", "out_names", "params_np")

    def __init__(self, g: Graph, seg_nodes: list[Node],
                 out_names: list[str]):
        names = {n.name for n in seg_nodes}
        sub_nodes: list[Node] = []
        added: set[str] = set()
        in_names: list[str] = []  # external tensor inputs, first-use order
        params_np: dict[str, np.ndarray] = {}
        for n in seg_nodes:
            for inp in n.inputs:
                if inp in added or inp in names:
                    continue
                src = g[inp]
                if src.is_const:
                    sub_nodes.append(src)
                    params_np[inp] = g.params[inp]
                else:
                    sub_nodes.append(Node(inp, VAR, (), {},
                                         shape=src.shape, dtype=src.dtype))
                    in_names.append(inp)
                added.add(inp)
            sub_nodes.append(n)
            added.add(n.name)
        self.sub = Graph(sub_nodes, list(out_names), params_np,
                         name="segment")
        self.key = self.sub.structural_hash()
        self.in_names = in_names
        self.out_names = list(out_names)
        self.params_np = params_np

    def canonical_param_order(self) -> list[str]:
        return [n.name for n in self.sub.nodes if n.is_const]


def _make_run_fn(sub: Graph):
    """Pure fn(params_list, inputs_list) -> outputs_list for a segment.

    Params/inputs are passed POSITIONALLY (canonical node order) so one
    jitted program serves every isomorphic segment regardless of its
    original node names."""
    const_order = [n.name for n in sub.nodes if n.is_const]
    var_order = [n.name for n in sub.nodes if n.is_var]

    def run_fn(params: Sequence, inputs: Sequence):
        env: dict[str, Any] = dict(zip(const_order, params))
        env.update(zip(var_order, inputs))
        for node in sub.nodes:
            if node.is_var or node.is_const:
                continue
            if node.op == TUPLE:
                env[node.name] = [env[i] for i in node.inputs]
            elif node.op == TUPLE_GET_ITEM:
                env[node.name] = env[node.inputs[0]][int(node.attrs["index"])]
            else:
                op = get_op(node.op)
                if op.jax_impl is None:
                    raise NotImplementedError(f"op {node.op} has no jax impl")
                env[node.name] = op.jax_impl(
                    *[env[i] for i in node.inputs], node=node)
        return [env[name] for name in sub.outputs]

    return run_fn


class SegmentedExecutor:
    """Executes a Graph as a pipeline of per-segment jit programs.

    Drop-in alternative to JaxExecutor for deep models; same run()/
    run_device()/capture contract."""

    def __init__(self, graph: Graph, capture: Sequence[str] | None = None,
                 fuse: bool = False, min_ops: int = 48, max_ops: int = 640,
                 min_scan_layers: int = 3, scan: bool = True, device=None):
        import sys

        import jax

        from ..ops import jax_ops  # noqa: F401  (registers jax impls)

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

        cap_set = set(self.capture) | set(g.outputs)
        seg_nodes = partition(g, min_ops=min_ops, max_ops=max_ops)

        # per-segment output lists: crossing values + captured/graph outputs
        produced_by_seg: list[set[str]] = [
            {n.name for n in seg} for seg in seg_nodes]
        seg_of: dict[str, int] = {}
        for si, names in enumerate(produced_by_seg):
            for nm in names:
                seg_of[nm] = si
        needed_later: dict[str, int] = {}
        for si, seg in enumerate(seg_nodes):
            for n in seg:
                for inp in n.inputs:
                    src = seg_of.get(inp)
                    if src is not None and src < si:
                        needed_later[inp] = max(needed_later.get(inp, -1), si)
        self._needed_later = needed_later
        self._cap_set = cap_set

        self.segments: list[_Segment] = []
        for si, seg in enumerate(seg_nodes):
            outs: list[str] = []
            for n in seg:
                if n.name in needed_later or n.name in cap_set:
                    outs.append(n.name)
            self.segments.append(_Segment(g, seg, outs))

        # shared jit cache: structural key -> (jitted fn, representative)
        self._jit_cache: dict[str, Any] = {}
        for s in self.segments:
            if s.key not in self._jit_cache:
                self._jit_cache[s.key] = jax.jit(_make_run_fn(s.sub))

        # device-resident params per segment, canonical (positional) order
        put = (lambda v: jax.device_put(dt.c_contig(v), device)
               if device is not None
               else jax.device_put(dt.c_contig(v)))
        self._seg_params = [
            [put(s.params_np[k]) for k in s.canonical_param_order()]
            for s in self.segments
        ]

        self._scan_fns: dict[int, Any] = {}
        if scan:
            for start, length, slot in self._find_scan_runs(min_scan_layers):
                self._scan_fns[start] = self._build_scan(start, length, slot)

    # -- scan-over-layers ---------------------------------------------------

    def _find_scan_runs(self, min_len: int
                        ) -> list[tuple[int, int, int]]:
        """(start, length, carry_slot) runs of >= min_len consecutive
        same-key single-output segments forming a simple carry chain:

          * member k+1 consumes member k's single output at one fixed input
            position (the carry slot), every other input is the SAME value
            for all members (loop-invariant);
          * intermediate outputs are consumed ONLY by the next member and
            are not captured (the scan hides them)."""
        runs = []
        segs = self.segments
        n = len(segs)
        i = 0
        while i < n:
            if len(segs[i].out_names) != 1:
                i += 1
                continue
            carry_slot = None
            j = i
            while j + 1 < n:
                s_prev, s_next = segs[j], segs[j + 1]
                if (s_next.key != segs[i].key
                        or len(s_next.out_names) != 1):
                    break
                slots = [q for q, nm in enumerate(s_next.in_names)
                         if nm == s_prev.out_names[0]]
                if len(slots) != 1:
                    break
                if carry_slot is None:
                    carry_slot = slots[0]
                elif slots[0] != carry_slot:
                    break
                # every non-carry input must match the run head's input
                # (loop-invariant value)
                if any(s_next.in_names[q] != segs[i].in_names[q]
                       for q in range(len(s_next.in_names))
                       if q != carry_slot):
                    break
                # the previous member's output must be PRIVATE to this chain
                prev_out = s_prev.out_names[0]
                if (prev_out in self._cap_set
                        or self._needed_later.get(prev_out, -1) > j + 1):
                    break
                j += 1
            if carry_slot is not None and j - i + 1 >= min_len:
                runs.append((i, j - i + 1, carry_slot))
                i = j + 1
            else:
                i += 1
        return runs

    def _build_scan(self, start: int, length: int, carry_slot: int):
        import jax
        from jax import lax

        rep = self.segments[start]
        run_fn = _make_run_fn(rep.sub)

        # stack each param along a leading layer axis; positional order is
        # canonical so isomorphic members line up
        orders = [self.segments[start + k].canonical_param_order()
                  for k in range(length)]
        stacked = []
        for pi in range(len(orders[0])):
            mats = [dt.c_contig(
                self.segments[start + k].params_np[orders[k][pi]])
                for k in range(length)]
            arr = np.stack(mats)
            stacked.append(jax.device_put(arr, self.device)
                           if self.device is not None
                           else jax.device_put(arr))

        n_in = len(rep.in_names)

        def scan_fn(stacked_params, inputs):
            invariants = [inputs[i] for i in range(n_in) if i != carry_slot]

            def body(carry, layer_params):
                ins = list(invariants)
                ins.insert(carry_slot, carry)
                outs = run_fn(layer_params, ins)
                return outs[0], None

            final, _ = lax.scan(body, inputs[carry_slot], stacked_params)
            return final

        return {"jit": jax.jit(scan_fn), "stacked": stacked,
                "length": length}

    # -- public API ---------------------------------------------------------

    @property
    def n_programs(self) -> int:
        """Distinct compiled programs (structural sharing diagnostic)."""
        return len(self._jit_cache)

    def run(self, inputs) -> list[np.ndarray]:
        return [np.asarray(o) for o in self.run_device(inputs)]

    def run_device(self, inputs):
        inputs = self._normalize(inputs)
        env: dict[str, Any] = dict(inputs)
        si = 0
        while si < len(self.segments):
            info = self._scan_fns.get(si)
            if info is not None:
                seg0 = self.segments[si]
                final = info["jit"](info["stacked"],
                                    [env[nm] for nm in seg0.in_names])
                length = info["length"]
                env[self.segments[si + length - 1].out_names[0]] = final
                si += length
                continue
            s = self.segments[si]
            outs = self._jit_cache[s.key](self._seg_params[si],
                                          [env[nm] for nm in s.in_names])
            for nm, val in zip(s.out_names, outs):
                env[nm] = val
            si += 1
        return [env[name] for name in self.capture]

    def _normalize(self, inputs) -> dict:
        if isinstance(inputs, np.ndarray) or (
            hasattr(inputs, "shape") and hasattr(inputs, "dtype")
        ):
            inputs = [inputs]
        if not isinstance(inputs, Mapping):
            assert len(self._var_names) == len(inputs), (
                f"expected {len(self._var_names)} inputs, got {len(inputs)}")
            inputs = dict(zip(self._var_names, inputs))
        missing = [v for v in self._var_names if v not in inputs]
        if missing:
            raise KeyError(f"graph inputs not provided: {missing}")
        return {k: inputs[k] for k in self._var_names}


def run_stream(executor: "SegmentedExecutor", inputs, on_value):
    """Execute segment-by-segment, calling on_value(name, np_array) for
    every computational node and releasing values as soon as no later
    segment needs them — bounded-memory full-graph capture (the
    calibration walk; whole-graph capture materializes every intermediate
    at once)."""
    import numpy as np

    ex = executor
    feeds = ex._normalize(inputs)
    env: dict = dict(feeds)
    last_need: dict[str, int] = {}
    for si, s in enumerate(ex.segments):
        for nm in s.in_names:
            last_need[nm] = si
    for si, s in enumerate(ex.segments):
        outs = ex._jit_cache[s.key](ex._seg_params[si],
                                    [env[nm] for nm in s.in_names])
        for nm, val in zip(s.out_names, outs):
            env[nm] = val
            on_value(nm, np.asarray(val))
        # free values no later segment consumes (on_value has already
        # seen them — this is what bounds memory)
        for nm in list(env):
            if last_need.get(nm, -1) <= si:
                del env[nm]
    return None
