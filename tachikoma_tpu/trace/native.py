"""ctypes binding to the native (C++) trace writer/verifier.

Native where the reference is native (its trace runtime is C++,
`src/runtime/contrib/tachikoma/`): record encoding, CRC, and file IO run in
libtktrace.so; Python only hands over raw buffers.  Falls back to the pure
Python writer when the toolchain is unavailable.  Output is byte-identical
to format.TraceWriter (cross-tested).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading


from .format import DTYPE_CODES, canonical_attrs, op_id

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "trace_writer.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libtktrace.so")

_lock = threading.Lock()
_lib = None
_lib_error: str | None = None


def _compile() -> str | None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    try:
        src_mtime = os.path.getmtime(_SRC)
    except OSError:
        return None
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= src_mtime:
        return _LIB
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB + ".tmp", _SRC, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_LIB + ".tmp", _LIB)
        return _LIB
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError) as e:
        global _lib_error
        _lib_error = f"native build failed: {e}"
        return None


def get_lib():
    """Load (building if needed) libtktrace; returns None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None or _lib_error is not None:
            return _lib
        path = _compile()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.tk_writer_open.restype = ctypes.c_void_p
        lib.tk_writer_open.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_uint32, ctypes.c_uint64,
        ]
        lib.tk_record_begin.restype = ctypes.c_int
        lib.tk_record_begin.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_char_p, ctypes.c_uint16,
            ctypes.c_char_p, ctypes.c_uint16,
            ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint16,
        ]
        lib.tk_record_tensor.restype = ctypes.c_int
        lib.tk_record_tensor.argtypes = [
            ctypes.c_void_p, ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_char_p, ctypes.c_uint64,
        ]
        lib.tk_record_end.restype = ctypes.c_int
        lib.tk_record_end.argtypes = [ctypes.c_void_p]
        lib.tk_writer_finish.restype = ctypes.c_int
        lib.tk_writer_finish.argtypes = [ctypes.c_void_p]
        lib.tk_trace_verify.restype = ctypes.c_int64
        lib.tk_trace_verify.argtypes = [ctypes.c_char_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


class NativeTraceWriter:
    """Same streaming interface as format.TraceWriter, file-path based."""

    def __init__(self, path: str, graph_hash: bytes, meta: dict | None = None):
        lib = get_lib()
        if lib is None:
            raise RuntimeError(f"native trace writer unavailable: {_lib_error}")
        self._lib = lib
        self._meta = canonical_attrs(meta or {})
        self._path = path
        self._graph_hash = graph_hash
        self._handle = None

    def begin(self, num_records: int):
        h = self._lib.tk_writer_open(
            self._path.encode(), self._graph_hash, self._meta, len(self._meta), num_records
        )
        if not h:
            raise OSError(f"cannot open trace file {self._path}")
        self._handle = h

    def write(self, rec):
        lib = self._lib
        name_b = rec.name.encode()
        op_b = rec.op_name.encode()
        attrs_b = canonical_attrs(rec.attrs)
        rc = lib.tk_record_begin(
            self._handle, rec.node_id, op_id(rec.op_name),
            name_b, len(name_b), op_b, len(op_b),
            attrs_b, len(attrs_b), len(rec.tensors),
        )
        if rc != 0:
            raise RuntimeError(f"tk_record_begin failed: {rc}")
        for t in rec.tensors:
            dims = (ctypes.c_uint32 * len(t.shape))(*t.shape)
            rc = lib.tk_record_tensor(
                self._handle, t.role, DTYPE_CODES[t.dtype], len(t.shape),
                dims, t.data, len(t.data),
            )
            if rc != 0:
                raise RuntimeError(f"tk_record_tensor failed: {rc}")
        rc = lib.tk_record_end(self._handle)
        if rc != 0:
            raise RuntimeError(f"tk_record_end failed: {rc}")

    def write_node(self, node_id: int, node, in_arrays, out_arrays):
        """Zero-copy record write: numpy array buffers are handed to the C
        writer directly (no .tobytes() copies, no TensorRecord objects) —
        the hot path for full-graph trace generation."""
        import numpy as np

        from ..utils import dtypes as dt

        lib = self._lib
        name_b = node.name.encode()
        op_b = node.op.encode()
        attrs_b = canonical_attrs(dict(node.attrs))
        rc = lib.tk_record_begin(
            self._handle, node_id, op_id(node.op),
            name_b, len(name_b), op_b, len(op_b),
            attrs_b, len(attrs_b), len(in_arrays) + len(out_arrays),
        )
        if rc != 0:
            raise RuntimeError(f"tk_record_begin failed: {rc}")
        for role, arr in [*in_arrays, *out_arrays]:
            a = dt.c_contig(arr)
            if a.dtype == np.bool_:
                a = a.astype(np.uint8)
                code = DTYPE_CODES["bool"]
            else:
                code = DTYPE_CODES[str(a.dtype)]
            dims = (ctypes.c_uint32 * a.ndim)(*a.shape)
            rc = lib.tk_record_tensor(
                self._handle, role, code, a.ndim, dims,
                ctypes.cast(a.ctypes.data, ctypes.c_char_p), a.nbytes,
            )
            if rc != 0:
                raise RuntimeError(f"tk_record_tensor failed: {rc}")
        rc = lib.tk_record_end(self._handle)
        if rc != 0:
            raise RuntimeError(f"tk_record_end failed: {rc}")

    def finish(self):
        rc = self._lib.tk_writer_finish(self._handle)
        self._handle = None
        if rc != 0:
            raise OSError(f"tk_writer_finish failed: {rc}")


def native_verify(path: str) -> int:
    """CRC-verify a trace file natively; returns record count.

    Raises TraceCorrupt on any integrity failure."""
    from .format import TraceCorrupt

    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native verifier unavailable: {_lib_error}")
    rc = lib.tk_trace_verify(path.encode())
    if rc < 0:
        reasons = {-1: "io error", -2: "bad magic", -3: "file CRC mismatch",
                   -4: "record CRC mismatch", -5: "malformed structure"}
        raise TraceCorrupt(f"{path}: {reasons.get(rc, rc)}")
    return int(rc)


def emit_trace_native(graph, inputs, path: str, backend: str = "jax",
                      meta: dict | None = None) -> int:
    """Trace emission using the native writer (byte-identical to the Python
    path, faster serialization)."""
    from .emitter import TraceEmitter, _build_records, _computational, _graph_hash

    em = TraceEmitter(graph, backend=backend, meta=meta)
    values = em._values_jax(inputs) if backend == "jax" else em._values_oracle(inputs)
    comp = _computational(em.graph)
    w = NativeTraceWriter(path, _graph_hash(em.graph), meta)
    w.begin(len(comp))
    for rec in _build_records(em.graph, values):
        w.write(rec)
    w.finish()
    return len(comp)
