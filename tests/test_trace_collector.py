"""Trace collector service tests — in-process localhost server + workers,
the reference's RPC-test strategy (`tests/python/unittest/test_runtime_rpc.py`:
distributed-without-a-cluster, SURVEY.md §4)."""

import io
import threading

import numpy as np
import pytest

from tachikoma_tpu.exec.trace_collector import TraceCollector, TraceUploader
from tachikoma_tpu.models.vision import lenet5
from tachikoma_tpu.quantize.quantizer import quantize
from tachikoma_tpu.trace.emitter import TraceEmitter, _build_records, _graph_hash, verify_trace
from tachikoma_tpu.trace.format import TraceReader


@pytest.fixture(scope="module")
def trace_records():
    g = lenet5(batch_size=1)
    rng = np.random.default_rng(0)
    data = [rng.standard_normal((1, 28, 28, 1)).astype(np.float32) for _ in range(2)]
    qg = quantize(g, data)
    em = TraceEmitter(qg, backend="oracle")
    values = em._values_oracle(data[0])
    recs = list(_build_records(em.graph, values))
    return qg, recs, em.emit_bytes(data[0])


def test_collect_merge_roundtrip(tmp_path, trace_records):
    qg, recs, single_blob = trace_records
    coll = TraceCollector(expected_workers=2)
    try:
        # two workers upload interleaved halves, out of order
        def work(worker_id, items):
            up = TraceUploader(coll.host, coll.port, worker_id)
            for rec in items:
                up.send_record(rec.node_id, rec.encode())
            up.finish()

        t1 = threading.Thread(target=work, args=("w0", list(reversed(recs[0::2]))))
        t2 = threading.Thread(target=work, args=("w1", recs[1::2]))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert coll.wait(10)
        assert not coll.errors
        path = str(tmp_path / "merged.tktrace")
        n = coll.write_trace(path, _graph_hash(qg))
        assert n == len(recs)
        # merged file verifies and is byte-identical to single-host emission
        res = verify_trace(path, qg)
        assert res["verified"] == res["records"]
        assert open(path, "rb").read() == single_blob
    finally:
        coll.close()


def test_corrupt_chunk_rejected(trace_records):
    qg, recs, _ = trace_records
    coll = TraceCollector(expected_workers=1)
    try:
        import hashlib, json, socket, struct
        from tachikoma_tpu.exec.trace_collector import _recv_frame, _send_frame

        sock = socket.create_connection((coll.host, coll.port))
        _send_frame(sock, {"type": "hello", "host": "evil"})
        _recv_frame(sock)
        enc = recs[0].encode()
        _send_frame(sock, {"type": "chunk", "host": "evil", "node_id": 1,
                           "sha256": "0" * 64, "size": len(enc)}, enc)
        resp, _ = _recv_frame(sock)
        assert resp["type"] == "reject"
        assert coll.errors
        sock.close()
    finally:
        coll.close()


def test_heartbeat_liveness(trace_records):
    coll = TraceCollector(expected_workers=1, heartbeat_timeout=0.2)
    try:
        up = TraceUploader(coll.host, coll.port, "w0")
        up.heartbeat()
        import time

        time.sleep(0.05)
        assert coll.dead_workers() == []
        time.sleep(0.4)
        assert coll.dead_workers() == ["w0"]
        up.close()
    finally:
        coll.close()
