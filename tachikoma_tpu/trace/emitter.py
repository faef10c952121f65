"""Trace-emitting executor + trace verifier.

The deterministic replacement for the reference's graph-runtime trace dumping
path (debug executor `DebugGetNodeOutput`,
`src/runtime/graph_executor/debug/graph_executor_debug.cc:296`, feeding the
tachikoma BYOC serialization): execute the integer graph — on the numpy
oracle or as ONE XLA program with intermediate capture — and stream
per-operator records (op id, attrs, input values, param values, expected
output) into the tachikoma-standard binary format.

Determinism: record order is the graph's topological node order; tensor bytes
are C-contiguous little-endian; integer graphs produce byte-identical traces
on every backend (oracle == XLA, single- or multi-device) because the integer
op semantics are bit-exact.
"""

from __future__ import annotations

import io
from typing import BinaryIO, Mapping
import os

import numpy as np

from ..ir.graph import CONST, TUPLE, TUPLE_GET_ITEM, VAR, Graph
from ..ir.infer import infer_types
from ..runtime.interpreter import Interpreter
from .format import (
    ROLE_INPUT,
    ROLE_OUTPUT,
    ROLE_PARAM,
    OpRecord,
    TensorRecord,
    TraceReader,
    TraceWriter,
)


def _graph_hash(graph: Graph) -> bytes:
    import hashlib

    return hashlib.sha256(graph.structural_bytes(include_params=True)).digest()


def _computational(graph: Graph):
    return [n for n in graph.nodes if n.op not in (VAR, CONST, TUPLE, TUPLE_GET_ITEM)]


def _build_records(graph: Graph, values: dict[str, np.ndarray]):
    """Yield OpRecords in topological order given all node values."""
    for node_id, n in enumerate(graph.nodes):
        if n.op in (VAR, CONST, TUPLE, TUPLE_GET_ITEM):
            continue
        tensors = []
        for i in n.inputs:
            src = graph[i]
            role = ROLE_PARAM if src.is_const else ROLE_INPUT
            tensors.append(TensorRecord.from_array(role, np.asarray(values[i])))
        out = values[n.name]
        if isinstance(out, (list, tuple)):
            for o in out:
                tensors.append(TensorRecord.from_array(ROLE_OUTPUT, np.asarray(o)))
        else:
            tensors.append(TensorRecord.from_array(ROLE_OUTPUT, np.asarray(out)))
        yield OpRecord(node_id, n.name, n.op, dict(n.attrs), tensors)


class TraceEmitter:
    """Emit a trace for (graph, inputs) using the oracle or the XLA executor.

    backend="jax" compiles the whole graph as one program with intermediate
    capture; backend="jax-segmented" uses the segmented executor
    (`runtime/segmented.py`) — required for deep models whose unrolled
    program exceeds remote compile limits.  Traces are byte-identical across
    ALL backends (integer semantics are exact at any jit boundary)."""

    def __init__(self, graph: Graph, backend: str = "jax",
                 meta: dict | None = None, require_integer: bool = False):
        self.graph = infer_types(graph) if any(
            n.shape is None and n.dtype != "tuple" for n in graph.nodes
        ) else graph
        self.backend = backend
        self.meta = dict(meta or {})
        self._executor = None
        self._pack_fn = None
        self.last_timings: dict = {}
        # ZKP-consumer mode: the integer record set is byte-exact by the ==
        # contract, while float-tail records (dequantize head, float
        # softmax) verify with allclose only.  require_integer rejects
        # graphs that would emit ANY float computational record, so every
        # record in the trace carries the bitwise guarantee (quantize with
        # integer_softmax + lut_ops and dequantize_outputs=False to
        # qualify; see quantize/config.py).
        if require_integer:
            floaty = [n.name for n in _computational(self.graph)
                      if str(n.dtype).startswith(("float", "bfloat"))]
            if floaty:
                raise ValueError(
                    "require_integer: graph has float computational nodes "
                    f"(first 8: {floaty[:8]}); quantize with integer_softmax"
                    "/lut_ops and dequantize_outputs=False for a fully "
                    "bitwise-pinned trace")
            self.meta.setdefault("integer_only", True)

    def _values_oracle(self, inputs) -> dict[str, np.ndarray]:
        values: dict[str, np.ndarray] = {}
        interp = Interpreter(self.graph)

        def hook(name, op, args, out):
            values[name] = out

        interp.run(inputs, intercept=hook)
        # vars + consts + tuples
        self._fill_structural(values, inputs)
        return values

    def _fill_structural(self, values, inputs):
        g = self.graph
        if isinstance(inputs, np.ndarray):
            inputs = [inputs]
        if not isinstance(inputs, Mapping):
            inputs = dict(zip([n.name for n in g.inputs], inputs))
        for n in g.nodes:
            if n.op == VAR:
                v = np.asarray(inputs[n.name])
                if str(v.dtype) != n.dtype:
                    v = v.astype(n.dtype)
                values[n.name] = v
            elif n.op == CONST:
                values[n.name] = g.params[n.name]
            elif n.op == TUPLE:
                values[n.name] = [values[i] for i in n.inputs]
            elif n.op == TUPLE_GET_ITEM:
                values[n.name] = values[n.inputs[0]][int(n.attrs["index"])]

    def _values_jax(self, inputs) -> dict[str, np.ndarray]:
        import time

        names = [n.name for n in _computational(self.graph)]
        if self._executor is None:
            if self.backend == "jax-segmented":
                from ..runtime.segmented import SegmentedExecutor

                self._executor = SegmentedExecutor(self.graph, capture=names)
            else:
                from ..runtime.executor import JaxExecutor

                self._executor = JaxExecutor(self.graph, capture=names)
        t0 = time.perf_counter()
        outs = self._executor.run_device(inputs)
        t1 = time.perf_counter()
        values = self._fetch_packed(names, outs)
        self.last_timings = {"dispatch_s": t1 - t0,
                             "fetch_s": time.perf_counter() - t1}
        self._fill_structural(values, inputs)
        return values

    def _fetch_packed(self, names, outs) -> dict[str, np.ndarray]:
        """Fetch every captured tensor in ONE device->host transfer.

        Per-tensor np.asarray costs a full round trip each over a tunneled
        device (~24 ms x 232 records dominated ResNet-50 trace time); a
        jitted byte-pack (bitcast + concatenate) collapses the fetch to a
        single buffer, sliced back into views on the host.  Falls back to
        per-tensor fetches on any unexpected value structure."""
        try:
            import jax
            import jax.numpy as jnp
            from jax import lax

            flat, spec = [], []
            for nm, o in zip(names, outs):
                if isinstance(o, (list, tuple)):
                    for j, t in enumerate(o):
                        flat.append(t)
                        spec.append((nm, j, np.dtype(str(t.dtype)), t.shape))
                else:
                    flat.append(o)
                    spec.append((nm, None, np.dtype(str(o.dtype)), o.shape))

            if self._pack_fn is None:
                def _pack(*xs):
                    parts = []
                    for x in xs:
                        v = x.reshape(-1)
                        if v.dtype == jnp.bool_:
                            v = v.astype(jnp.uint8)
                        if v.dtype != jnp.uint8:
                            v = lax.bitcast_convert_type(v, jnp.uint8)
                        parts.append(v.reshape(-1))
                    return jnp.concatenate(parts) if parts else \
                        jnp.zeros((0,), jnp.uint8)

                self._pack_fn = jax.jit(_pack)
            buf = np.asarray(self._pack_fn(*flat))
        except Exception:  # pragma: no cover - structure we cannot pack
            self._pack_fn = None
            fetched = [
                [np.asarray(t) for t in o] if isinstance(o, (list, tuple))
                else np.asarray(o) for o in outs]
            return dict(zip(names, fetched))

        values: dict[str, np.ndarray] = {}
        off = 0
        for nm, j, dt, sh in spec:
            nbytes = int(np.prod(sh)) * dt.itemsize if sh else dt.itemsize
            arr = buf[off:off + nbytes].view(dt).reshape(sh)
            off += nbytes
            if j is None:
                values[nm] = arr
            else:
                values.setdefault(nm, [])
                values[nm].append(arr)
        return values

    def emit(self, inputs, f: BinaryIO) -> int:
        """Write a trace for one batch of inputs; returns record count."""
        values = (
            self._values_jax(inputs) if self.backend.startswith("jax") else self._values_oracle(inputs)
        )
        comp = _computational(self.graph)
        w = TraceWriter(f, _graph_hash(self.graph), self.meta)
        w.begin(len(comp))
        for rec in _build_records(self.graph, values):
            w.write(rec)
        w.finish()
        return len(comp)

    def emit_bytes(self, inputs) -> bytes:
        buf = io.BytesIO()
        self.emit(inputs, buf)
        return buf.getvalue()

    def _pack_groups(self, names, outs, chunks: int):
        """(flat, spec, groups): spec entries node-major; groups = contiguous
        spec-index ranges of ~equal byte volume cut at NODE boundaries."""
        flat, spec, node_end = [], [], {}
        for nm, o in zip(names, outs):
            if isinstance(o, (list, tuple)):
                for j, t in enumerate(o):
                    flat.append(t)
                    spec.append((nm, j, np.dtype(str(t.dtype)), t.shape))
            else:
                flat.append(o)
                spec.append((nm, None, np.dtype(str(o.dtype)), o.shape))
            node_end[nm] = len(spec)
        sizes = [(int(np.prod(sh)) if sh else 1) * dt.itemsize
                 for _, _, dt, sh in spec]
        total = sum(sizes)
        cuts, acc, goal = [], 0, max(total // max(chunks, 1), 1)
        for nm in names:
            acc = sum(sizes[: node_end[nm]])
            if acc >= goal * (len(cuts) + 1) and node_end[nm] < len(spec):
                cuts.append(node_end[nm])
        bounds = [0] + cuts + [len(spec)]
        groups = [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)
                  if bounds[i] < bounds[i + 1]]
        return flat, spec, groups

    def _slice_group(self, buf, spec, lo, hi, values):
        off = 0
        for nm, j, dt, sh in spec[lo:hi]:
            # scalars () contribute 1 element; zero-element shapes (0 in
            # sh) contribute 0 BYTES in the pack — `or 1` here would shift
            # every later tensor's offset (matches _fetch_packed)
            nbytes = (int(np.prod(sh)) if sh else 1) * dt.itemsize
            arr = buf[off:off + nbytes].view(dt).reshape(sh)
            off += nbytes
            if j is None:
                values[nm] = arr
            else:
                values.setdefault(nm, [])
                values[nm].append(arr)

    def emit_to(self, inputs, path: str) -> int:
        """Write a trace file; uses the native (C++) writer's zero-copy path
        when the toolchain is available (byte-identical output, ~an order of
        magnitude faster serialization), falling back to the Python writer.

        The jax path STREAMS: captured tensors are packed into ~4 byte
        buffers on device; while the host serializes the records of one
        buffer, a worker thread pulls the next — device->host transfer and
        record writing overlap instead of running back to back."""
        import time

        from .native import NativeTraceWriter, native_available

        if not native_available() or not self.backend.startswith("jax"):
            with open(path, "wb") as f:
                return self.emit(inputs, f)

        names = [n.name for n in _computational(self.graph)]
        if self._executor is None:
            if self.backend == "jax-segmented":
                from ..runtime.segmented import SegmentedExecutor

                self._executor = SegmentedExecutor(self.graph, capture=names)
            else:
                from ..runtime.executor import JaxExecutor

                self._executor = JaxExecutor(self.graph, capture=names)
        t0 = time.perf_counter()
        outs = self._executor.run_device(inputs)
        t_dispatch = time.perf_counter() - t0

        g = self.graph
        comp = _computational(g)
        values: dict = {}
        # VAR/CONST up front; TUPLE/TUPLE_GET_ITEM resolve inline during the
        # walk (their computational inputs land group by group)
        feeds = inputs
        if isinstance(feeds, np.ndarray):
            feeds = [feeds]
        if not isinstance(feeds, Mapping):
            feeds = dict(zip([n.name for n in g.inputs], feeds))
        for n in g.nodes:
            if n.op == VAR:
                v = np.asarray(feeds[n.name])
                values[n.name] = v.astype(n.dtype) \
                    if str(v.dtype) != n.dtype else v
            elif n.op == CONST:
                values[n.name] = g.params[n.name]

        fetch_wait = 0.0
        fetched_bytes = 0
        try:
            import jax  # noqa: F401

            chunks = int(os.environ.get("TK_TRACE_CHUNKS", "6"))
            flat, spec, groups = self._pack_groups(names, outs,
                                                   chunks=chunks)
            if self._pack_fn is None:
                self._fetch_packed(names[:0], [])  # builds self._pack_fn
            packed = [self._pack_fn(*flat[lo:hi]) for lo, hi in groups]
            fetched_bytes = sum(int(p.size) for p in packed)
            # overlap: hint the runtime (copy_to_host_async — a no-op on
            # plugins without async host copies) AND drive the transfers
            # from ONE background thread in group order (np.asarray over
            # the tunnel does not hold the GIL — measured, round-5 trace
            # probe — so the record walk below runs concurrently).
            for p in packed:
                try:
                    p.copy_to_host_async()
                except Exception:
                    pass
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=1)
            futs = [pool.submit(np.asarray, p) for p in packed]
        except Exception:  # pragma: no cover — unpackable structure
            vals = self._fetch_packed(names, outs)
            values.update(vals)
            groups, futs, spec = [(0, 0)], [None], []
            pool = None

        w = NativeTraceWriter(path, _graph_hash(g), self.meta)
        w.begin(len(comp))
        node_iter = iter(enumerate(g.nodes))
        pending = None

        def write_ready():
            nonlocal pending
            while True:
                node_id, n = pending or next(node_iter, (None, None))
                pending = None
                if n is None:
                    return
                if n.op in (VAR, CONST):
                    continue
                if n.op == TUPLE:
                    if any(i not in values for i in n.inputs):
                        pending = (node_id, n)
                        return
                    values[n.name] = [values[i] for i in n.inputs]
                    continue
                if n.op == TUPLE_GET_ITEM:
                    if n.inputs[0] not in values:
                        pending = (node_id, n)
                        return
                    values[n.name] = values[n.inputs[0]][
                        int(n.attrs["index"])]
                    continue
                if n.name not in values:
                    pending = (node_id, n)
                    return
                ins = []
                for i in n.inputs:
                    role = ROLE_PARAM if g[i].is_const else ROLE_INPUT
                    ins.append((role, np.asarray(values[i])))
                out = values[n.name]
                outs_ = ([(ROLE_OUTPUT, np.asarray(o)) for o in out]
                         if isinstance(out, (list, tuple))
                         else [(ROLE_OUTPUT, np.asarray(out))])
                w.write_node(node_id, n, ins, outs_)

        group_waits = []
        group_walks = []
        for (lo, hi), fut in zip(groups, futs):
            if fut is not None:
                t1 = time.perf_counter()
                buf = fut.result() if hasattr(fut, "result") \
                    else np.asarray(fut)
                t2 = time.perf_counter()
                fetch_wait += t2 - t1
                group_waits.append(round(t2 - t1, 3))
                self._slice_group(buf, spec, lo, hi, values)
            t3 = time.perf_counter()
            write_ready()
            group_walks.append(round(time.perf_counter() - t3, 3))
        if pool is not None:
            pool.shutdown(wait=False)
        w.finish()
        self.last_timings = {"dispatch_s": t_dispatch,
                             "fetch_s": fetch_wait,
                             "fetched_bytes": fetched_bytes,
                             "group_waits": group_waits,
                             "group_walks": group_walks}
        return len(comp)


def emit_trace(graph: Graph, inputs, path: str | None = None, backend: str = "jax",
               meta: dict | None = None,
               require_integer: bool = False) -> bytes | int:
    em = TraceEmitter(graph, backend=backend, meta=meta,
                      require_integer=require_integer)
    if path is None:
        return em.emit_bytes(inputs)
    return em.emit_to(inputs, path)


def verify_trace(trace: bytes | str, graph: Graph | None = None) -> dict:
    """Re-execute every record with the numpy oracle and bit-compare outputs —
    the 'fake trace consumer' verifier (the role of run_and_verify in the
    reference's BYOC tests, `tests/python/contrib/test_tachikoma.py:166`,
    and of the ZKP circuit's witness check).

    Returns {'records': N, 'verified': N_ok, 'mismatches': [names]}.
    """
    from ..ir.graph import Node
    from ..ir.registry import get_op

    if isinstance(trace, (str,)):
        with open(trace, "rb") as f:
            reader = TraceReader(f)
    else:
        reader = TraceReader(io.BytesIO(trace))

    if graph is not None:
        gh = _graph_hash(graph)
        if gh != reader.graph_hash:
            raise ValueError("trace graph hash does not match supplied graph")

    mismatches = []
    n_ok = 0
    for rec in reader:
        op = get_op(rec.op_name)
        if op.np_impl is None:
            mismatches.append((rec.name, "no oracle impl"))
            continue
        args = [t.to_array() for t in rec.tensors if t.role in (ROLE_INPUT, ROLE_PARAM)]
        shadow = Node(rec.name, rec.op_name, tuple(f"i{k}" for k in range(len(args))),
                      {k: tuple(v) if isinstance(v, list) else v for k, v in rec.attrs.items()})
        try:
            out = op.np_impl(*args, node=shadow)
        except Exception as e:  # pragma: no cover
            mismatches.append((rec.name, f"exec error: {e}"))
            continue
        want = rec.output.to_array()
        got = np.asarray(out[0] if isinstance(out, (list, tuple)) else out)
        if want.dtype.kind in "fc":
            ok = np.allclose(got.astype(np.float64), want.astype(np.float64), rtol=1e-5, atol=1e-6)
        else:
            ok = got.shape == want.shape and bool((got == want).all())
        if ok:
            n_ok += 1
        else:
            mismatches.append((rec.name, "output mismatch"))
    return {"records": len(reader), "verified": n_ok, "mismatches": mismatches}
