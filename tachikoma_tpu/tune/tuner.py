"""Block-size autotuner for the Pallas kernels.

The one tuning loop this framework keeps from the reference's three
generations of autotuning (SURVEY.md §7.1: 'a small block-size autotuner —
the only tuning we keep'): grid-search candidate tilings, measure on device
with the differential timing protocol, record every trial (including
failures, taxonomized like MeasureErrorNo) into the TuneDatabase.
"""

from __future__ import annotations

import traceback
from typing import Callable, Iterable, Sequence

import numpy as np

from ..utils.timing import time_jitted
from .database import (
    COMPILE_ERROR,
    NO_ERROR,
    RUNTIME_ERROR,
    TIMEOUT,
    TuneDatabase,
    TuneRecord,
)


def matmul_workload(M: int, K: int, N: int, fused: bool) -> str:
    return f"qmatmul_int8/M{M}_K{K}_N{N}/{'fused' if fused else 'raw'}"


def conv_workload(n, h, w, cin, cout, kh, kw, stride, groups) -> str:
    return (
        f"qconv2d_int8/N{n}_H{h}_W{w}_C{cin}_O{cout}_K{kh}x{kw}"
        f"_S{stride[0]}x{stride[1]}_G{groups}"
    )


def matmul_candidates(M: int, K: int, N: int) -> list[tuple[int, int, int]]:
    cands = []
    for bm in (256, 512, 1024):
        for bn in (256, 512, 1024):
            for bk in (512, 1024, 2048):
                if bm <= M * 2 and bn <= N * 2 and bk <= K * 2:
                    cands.append((min(bm, M), min(bn, N), min(bk, K)))
    return sorted(set(cands))


def measure_candidate(build_and_run: Callable[[], Callable[[], None]],
                      repeats: int = 3) -> tuple[float, int, str]:
    """Compile + run one candidate; returns (time_s, error_no, msg)."""
    try:
        run = build_and_run()
    except Exception:
        return float("inf"), COMPILE_ERROR, traceback.format_exc(limit=2)
    try:
        t = time_jitted(run, warmup=1, repeats=repeats)
        return t, NO_ERROR, ""
    except Exception:
        return float("inf"), RUNTIME_ERROR, traceback.format_exc(limit=2)


def tune_matmul(
    M: int, K: int, N: int, db: TuneDatabase,
    fused: bool = False,
    candidates: Sequence[tuple[int, int, int]] | None = None,
    verbose: bool = True,
) -> TuneRecord | None:
    """Grid-search matmul blockings on the current default device."""
    import jax
    import jax.numpy as jnp

    from ..ops.pallas.matmul_int8 import _build_qmatmul, _interpret_default
    from ..ops.pallas.qms32 import plan_requantize

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.integers(-127, 127, (M, K)).astype(np.int8))
    B = jnp.asarray(rng.integers(-127, 127, (K, N)).astype(np.int8))
    interp = _interpret_default()
    if fused:
        mult, shift = plan_requantize(0.0004, 0.05)
        bias = jnp.zeros((1, N), jnp.int32)
        mv = jnp.full((1, N), mult, jnp.int32)
        sv = jnp.full((1, N), shift, jnp.int32)

    workload = matmul_workload(M, K, N, fused)
    for bm, bn, bk in candidates or matmul_candidates(M, K, N):
        if M % bm or N % bn or K % bk:
            continue

        def build():
            if fused:
                f = _build_qmatmul(M, K, N, bm, bn, bk, 0, "UPWARD", -128, 127,
                                   "int8", True, interp, (int(shift),))
                args = (A, B, bias, mv, sv)
            else:
                f = _build_qmatmul(M, K, N, bm, bn, bk, 0, "UPWARD", -128, 127,
                                   "int32", False, interp)
                args = (A, B)
            f(*args).block_until_ready()  # compile now
            return lambda: f(*args).block_until_ready()

        t, err, msg = measure_candidate(build)
        rec = TuneRecord(workload, {"blocks": [bm, bn, bk]},
                         t * 1e3 if t != float("inf") else float("inf"), err, msg)
        db.add(rec)
        if verbose:
            status = f"{t*1e3:.3f} ms" if err == NO_ERROR else f"err{err}"
            print(f"  {workload} blocks=({bm},{bn},{bk}): {status}", flush=True)
    return db.best(workload)


def tune_conv(
    shape: tuple, wshape: tuple, strides, padding, groups, db: TuneDatabase,
    verbose: bool = True,
) -> TuneRecord | None:
    """Measure the conv kernel for a layer shape (the kernel's blocking is
    currently internal; this records achieved time + TOPS for reporting)."""
    import jax.numpy as jnp

    from ..ops.pallas.conv_int8 import qconv2d_int8, qconv2d_supported
    from ..ops.pallas.qms32 import plan_requantize

    n, h, w, cin = shape
    kh, kw, wcin, cout = wshape
    workload = conv_workload(n, h, w, cin, cout, kh, kw, strides, groups)
    if not qconv2d_supported(shape, wshape, strides, padding, groups):
        db.add(TuneRecord(workload, {}, float("inf"), COMPILE_ERROR, "unsupported"))
        return None
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 127, shape).astype(np.int8))
    wt = jnp.asarray(rng.integers(-127, 127, wshape).astype(np.int8))
    m, s = plan_requantize(0.0004, 0.05)

    def build():
        def run():
            qconv2d_int8(x, wt, multiplier=m, shift=s, strides=tuple(strides),
                         padding=tuple(padding), groups=groups).block_until_ready()
        run()
        return run

    t, err, msg = measure_candidate(build)
    macs = n * ((h + padding[0] + padding[2] - kh) // strides[0] + 1) * (
        (w + padding[1] + padding[3] - kw) // strides[1] + 1
    ) * cout * kh * kw * (cin // groups)
    rec = TuneRecord(
        workload, {"kernel": "pallas_direct"},
        t * 1e3 if t != float("inf") else float("inf"), err, msg,
        meta={"tops": round(2 * macs / t / 1e12, 2) if err == NO_ERROR else 0},
    )
    db.add(rec)
    if verbose:
        status = f"{t*1e3:.3f} ms ({rec.meta.get('tops', 0)} TOPS)" if err == NO_ERROR else f"err{err}: {msg[:80]}"
        print(f"  {workload}: {status}", flush=True)
    return db.best(workload)
