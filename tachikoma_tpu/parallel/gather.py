"""Deterministic multi-host trace gather.

The distributed half of trace emission (SURVEY.md §7.3 'deterministic
multi-host trace gather: fixed op order + fixed shard order regardless of
arrival; content-addressed chunks, host-0 merge'):

  * the model runs as ONE GSPMD program over the mesh (ShardedExecutor);
  * every captured node value is materialized as a GLOBAL array —
    single-process meshes read it directly, multi-process meshes reassemble
    from addressable shards + process_allgather;
  * only the coordinator (process 0) writes the trace, iterating records in
    topological node order — so the bytes are identical to a single-device
    emission (tested) regardless of mesh shape or host count;
  * every gather step is wrapped in retry-with-heartbeat (the failure
    detection role the reference delegates to its RPC tracker re-registration
    and measure timeouts, SURVEY.md §5.3).
"""

from __future__ import annotations

import hashlib
import io
import logging
import time
from typing import BinaryIO, Mapping

import numpy as np

from ..ir.graph import Graph
from ..trace.emitter import TraceEmitter, _build_records, _computational, _graph_hash
from ..trace.format import TraceWriter

log = logging.getLogger("tachikoma_tpu.gather")


def _with_retry(fn, what: str, retries: int = 3, backoff: float = 0.5):
    last = None
    for attempt in range(retries):
        try:
            return fn()
        except Exception as e:  # pragma: no cover - exercised via fault injection
            last = e
            log.warning("gather step %s failed (attempt %d/%d): %s",
                        what, attempt + 1, retries, e)
            time.sleep(backoff * (2 ** attempt))
    raise RuntimeError(f"gather step {what} failed after {retries} attempts") from last


def global_array(x) -> np.ndarray:
    """Materialize a (possibly sharded, possibly multi-host) jax array."""
    import jax

    if isinstance(x, np.ndarray):
        return x
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    # multi-host: every process holds some shards; allgather reassembles
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def is_coordinator() -> bool:
    import jax

    return jax.process_index() == 0


class ShardedTraceEmitter:
    """Trace emission from a sharded (dp x tp, single- or multi-host) run.

    Bytes are identical to TraceEmitter's single-device output for the same
    (graph, inputs) — sharding is invisible in the trace.
    """

    def __init__(self, graph: Graph, mesh, meta: dict | None = None,
                 param_specs=None, input_specs=None):
        from ..runtime.executor import computational_nodes
        from .shard import ShardedExecutor

        self.graph = graph
        self.meta = dict(meta or {})
        self._names = computational_nodes(graph)
        self._ex = ShardedExecutor(
            graph, mesh, capture=self._names,
            param_specs=param_specs, input_specs=input_specs,
        )

    def emit(self, inputs, f: BinaryIO | None) -> dict:
        """Run sharded, gather deterministically, write on the coordinator.

        Returns a manifest {records, bytes, chunk_hashes} on the coordinator
        (chunk_hashes = per-record sha256 — the content-addressed integrity
        index); non-coordinators get {'records': N} only.
        """
        outs = _with_retry(lambda: self._ex.run_device(inputs), "execute")
        values = {}
        for name, val in zip(self._names, outs):
            values[name] = _with_retry(
                lambda v=val: global_array(v), f"gather:{name}"
            )
        em = TraceEmitter(self.graph, backend="oracle", meta=self.meta)
        em._fill_structural(values, inputs)

        if not is_coordinator():
            return {"records": len(self._names)}

        assert f is not None, "coordinator needs an output stream"
        w = TraceWriter(f, _graph_hash(em.graph), self.meta)
        w.begin(len(self._names))
        hashes = []
        n_bytes = 0
        for rec in _build_records(em.graph, values):
            enc = rec.encode()
            hashes.append(hashlib.sha256(enc).hexdigest())
            n_bytes += len(enc)
            w.write(rec)
        w.finish()
        return {"records": len(self._names), "bytes": n_bytes, "chunk_hashes": hashes}

    def emit_bytes(self, inputs) -> bytes:
        buf = io.BytesIO()
        self.emit(inputs, buf)
        return buf.getvalue()


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None):
    """Initialize the multi-host process group (control plane) — the
    jax.distributed replacement for the reference's RPC tracker matchmaking
    (`python/tvm/rpc/tracker.py:93-148`).  No-op when already initialized or
    single-process."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
