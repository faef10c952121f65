"""Trace subsystem tests: determinism, integrity, verification, and
Python/native writer byte-identity."""

import io
import os

import numpy as np
import pytest

from tachikoma_tpu import GraphBuilder, infer_types, run_graph
from tachikoma_tpu.models.vision import lenet5
from tachikoma_tpu.quantize.quantizer import quantize
from tachikoma_tpu.trace.emitter import TraceEmitter, emit_trace, verify_trace
from tachikoma_tpu.trace.format import (
    OpRecord,
    TensorRecord,
    TraceCorrupt,
    TraceReader,
    op_id,
)


@pytest.fixture(scope="module")
def qlenet():
    g = lenet5(batch_size=1)
    rng = np.random.default_rng(0)
    data = [rng.standard_normal((1, 28, 28, 1)).astype(np.float32) for _ in range(2)]
    return quantize(g, data), data[0]


def test_trace_roundtrip(qlenet):
    qg, x = qlenet
    blob = emit_trace(qg, x, backend="oracle")
    reader = TraceReader(io.BytesIO(blob))
    assert len(reader) > 10
    rec = reader[0]
    assert rec.op_name == "qnn.quantize"
    assert rec.output.dtype == "int8"
    # record contents reconstruct to real tensors
    for r in reader:
        out = r.output.to_array()
        assert out.size > 0


def test_trace_deterministic_across_backends(qlenet):
    """Oracle trace == XLA trace, byte for byte, on the integer portion.
    Float tail ops (dequantize/softmax) are excluded from byte-compare but
    must be allclose."""
    qg, x = qlenet
    b1 = emit_trace(qg, x, backend="oracle")
    b2 = emit_trace(qg, x, backend="jax")
    r1, r2 = TraceReader(io.BytesIO(b1)), TraceReader(io.BytesIO(b2))
    assert len(r1) == len(r2)
    n_int = 0
    for rec1, rec2 in zip(r1, r2):
        assert rec1.name == rec2.name and rec1.op_name == rec2.op_name
        o1, o2 = rec1.output.to_array(), rec2.output.to_array()
        if o1.dtype.kind in "iu":
            assert rec1.encode() == rec2.encode(), f"record bytes differ: {rec1.name}"
            n_int += 1
        else:
            np.testing.assert_allclose(o1, o2, rtol=1e-5, atol=1e-6)
    assert n_int >= 10


def test_trace_deterministic_rerun(qlenet):
    qg, x = qlenet
    em = TraceEmitter(qg, backend="jax")
    assert em.emit_bytes(x) == em.emit_bytes(x)


def test_trace_verifier_passes(qlenet):
    qg, x = qlenet
    blob = emit_trace(qg, x, backend="jax")
    res = verify_trace(blob, qg)
    assert res["records"] == res["verified"], res["mismatches"]


def test_trace_verifier_catches_tamper(qlenet):
    qg, x = qlenet
    blob = bytearray(emit_trace(qg, x, backend="oracle"))
    reader = TraceReader(io.BytesIO(bytes(blob)))
    # flip one byte inside the first record's tensor data
    _, off = reader.index[0]
    blob[off + 200] ^= 0xFF
    with pytest.raises(TraceCorrupt):
        TraceReader(io.BytesIO(bytes(blob)))  # file CRC catches it
    # per-record CRC catches it even with file CRC check disabled
    with pytest.raises(TraceCorrupt):
        r = TraceReader(io.BytesIO(bytes(blob)), verify_crc=False)
        _ = r[0]


def test_trace_graph_hash_mismatch(qlenet):
    qg, x = qlenet
    blob = emit_trace(qg, x, backend="oracle")
    other = lenet5(batch_size=1, seed=7)
    with pytest.raises(ValueError, match="hash"):
        verify_trace(blob, other)


def test_op_ids_stable():
    assert op_id("qnn.conv2d") == 1
    assert op_id("qnn.dense") == 2
    assert op_id("qnn.requantize") == 3
    unknown = op_id("my.custom.op")
    assert unknown & 0x80000000
    assert op_id("my.custom.op") == unknown  # stable


def test_native_writer_byte_identical(tmp_path, qlenet):
    native = pytest.importorskip("tachikoma_tpu.trace.native")
    if not native.native_available():
        pytest.skip("no native toolchain")
    qg, x = qlenet
    py_blob = emit_trace(qg, x, backend="oracle")
    path = str(tmp_path / "t.tktrace")
    n = native.emit_trace_native(qg, x, path, backend="oracle")
    with open(path, "rb") as f:
        native_blob = f.read()
    assert native_blob == py_blob, "native writer output differs from python writer"
    assert native.native_verify(path) == n


def test_native_verify_catches_corruption(tmp_path, qlenet):
    native = pytest.importorskip("tachikoma_tpu.trace.native")
    if not native.native_available():
        pytest.skip("no native toolchain")
    qg, x = qlenet
    path = str(tmp_path / "t.tktrace")
    native.emit_trace_native(qg, x, path, backend="oracle")
    data = bytearray(open(path, "rb").read())
    data[len(data) // 2] ^= 0x5A
    bad = str(tmp_path / "bad.tktrace")
    open(bad, "wb").write(bytes(data))
    with pytest.raises(TraceCorrupt):
        native.native_verify(bad)


def test_trace_to_file(tmp_path, qlenet):
    qg, x = qlenet
    path = str(tmp_path / "lenet.tktrace")
    n = emit_trace(qg, x, path=path, backend="oracle")
    assert n > 0 and os.path.getsize(path) > 1000
    res = verify_trace(path, qg)
    assert res["verified"] == res["records"]


def test_native_tktrace_cli(tmp_path, rng):
    """The standalone C++ trace inspector verifies traces, prints a record
    histogram, and detects single-bit corruption."""
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        pytest.skip("no g++")
    from tachikoma_tpu.models import lenet5
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.trace.emitter import TraceEmitter

    exe = str(tmp_path / "tktrace")
    subprocess.run(["g++", "-O2", "-o", exe, "native/tktrace_cli.cpp",
                    "-lz"], check=True, cwd="/root/repo")
    g = lenet5(batch_size=1)
    x = rng.standard_normal((1, 28, 28, 1)).astype(np.float32)
    qg = quantize(g, [x])
    path = str(tmp_path / "t.tktrace")
    TraceEmitter(qg, backend="numpy").emit_to(x, path)

    r = subprocess.run([exe, "verify", path], capture_output=True, text=True)
    assert r.returncode == 0 and "OK:" in r.stdout
    r = subprocess.run([exe, "info", path], capture_output=True, text=True)
    assert r.returncode == 0 and "qnn.conv2d" in r.stdout

    blob = bytearray(open(path, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    bad = str(tmp_path / "bad.tktrace")
    open(bad, "wb").write(bytes(blob))
    r = subprocess.run([exe, "verify", bad], capture_output=True, text=True)
    assert r.returncode == 1


def test_require_integer_rejects_float_tail():
    """ZKP-consumer mode: require_integer refuses graphs whose trace would
    contain ANY float record (only the integer set is byte-pinned)."""
    import pytest

    from tachikoma_tpu.models.vision import mlp
    from tachikoma_tpu.quantize.config import QConfig
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.trace.emitter import TraceEmitter

    g = mlp(batch_size=1, in_dim=16, hidden=(8,), num_classes=4)
    x = np.random.default_rng(0).standard_normal((1, 16)).astype(np.float32)
    # default quantize keeps a float tail (dequantized outputs + softmax)
    qg = quantize(g, [x])
    with pytest.raises(ValueError, match="require_integer"):
        TraceEmitter(qg, require_integer=True)
    # integer-only config qualifies, and the emitter stamps the meta flag
    qcfg = QConfig(dequantize_outputs=False, integer_softmax=True,
                   float_ops=frozenset())
    qg2 = quantize(g, [x], qcfg)
    em = TraceEmitter(qg2, backend="oracle", require_integer=True)
    assert em.meta.get("integer_only") is True
    buf = em.emit_bytes([x])
    assert buf  # emits fine
