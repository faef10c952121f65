"""Dtype helpers shared by type inference and the quantizer.

Mirrors the small dtype utility surface of the reference's QNN utils
(`src/relay/qnn/utils.h:51-75` GetQmin/GetQmax).
"""

from __future__ import annotations

import numpy as np

INT_DTYPES = ("int8", "uint8", "int16", "uint16", "int32", "int64")
FLOAT_DTYPES = ("float16", "bfloat16", "float32", "float64")


def is_int(dtype: str) -> bool:
    return dtype.startswith("int") or dtype.startswith("uint")


def is_float(dtype: str) -> bool:
    return dtype in FLOAT_DTYPES


def qmin(dtype: str) -> int:
    """Minimum representable value (reference: `qnn/utils.h:51 GetQmin`)."""
    return int(np.iinfo(np.dtype(dtype)).min)


def qmax(dtype: str) -> int:
    """Maximum representable value (reference: `qnn/utils.h:64 GetQmax`)."""
    return int(np.iinfo(np.dtype(dtype)).max)


def promote(a: str, b: str) -> str:
    """Numpy-style type promotion restricted to our dtype set."""
    if a == b:
        return a
    if "bfloat16" in (a, b):
        other = b if a == "bfloat16" else a
        if is_int(other) or other == "float16":
            return "bfloat16"
        return other
    return str(np.promote_types(np.dtype(a), np.dtype(b)))


def normalize(dtype) -> str:
    return str(np.dtype(dtype)) if dtype != "bfloat16" else "bfloat16"


def c_contig(v):
    """C-contiguous ndarray PRESERVING 0-d shape (np.ascontiguousarray
    silently promotes 0-d arrays to shape (1,), which corrupts scalar
    params through serialization/device-put round-trips)."""
    a = np.ascontiguousarray(v)
    return a.reshape(()) if np.ndim(v) == 0 else a
