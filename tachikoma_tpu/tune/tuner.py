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


def _feedback_sum(a, out):
    """Full-output consumption: the xor bit depends on EVERY output element
    (a bare element pick would let XLA narrow the computation)."""
    import jax.numpy as jnp

    return a ^ (out.astype(jnp.int32).sum() & 1).astype(a.dtype)


def _measure_scan(fn, x0, repeats: int = 3,
                  iters_lo: int = 8, iters_hi: int = 40) -> tuple[float, int, str]:
    """Compile + measure per-iteration time with the scan differential
    protocol (dispatch over the tunnel costs ~25 ms; naive per-dispatch
    timing would swamp every kernel)."""
    from ..utils.timing import per_iter_scan

    try:
        from ..utils.timing import per_iter_chain
        t = per_iter_chain(fn, x0, _feedback_sum, repeats=repeats)
        return t, NO_ERROR, ""
    except Exception:
        tb = traceback.format_exc(limit=4)
        err = COMPILE_ERROR if ("Mosaic" in tb or "compile" in tb.lower()) else RUNTIME_ERROR
        return float("inf"), err, tb[-500:]


def conv_workload(n, h, w, cin, cout, kh, kw, stride, groups) -> str:
    return (
        f"qconv2d_int8/N{n}_H{h}_W{w}_C{cin}_O{cout}_K{kh}x{kw}"
        f"_S{stride[0]}x{stride[1]}_G{groups}"
    )


def matmul_candidates(M: int, K: int, N: int) -> list[tuple[int, int, int]]:
    from ..ops.pallas.matmul_int8 import _round_up

    mp = _round_up(M, 32)
    np_ = _round_up(N, 128)
    kp = _round_up(K, 128)
    cands = []
    for bm in (128, 256, 512, 1024):
        for bn in (128, 256, 512, 1024):
            for bk in (128, 256, 512, 1024, 2048):
                bm2, bn2, bk2 = min(bm, mp), min(bn, np_), min(bk, kp)
                # VMEM: double-buffered x/w blocks + int32 acc + out
                vm = 2 * bm2 * bk2 + 2 * bk2 * bn2 + 4 * bm2 * bn2 + 2 * bm2 * bn2
                if vm <= 12 * 1024 * 1024:
                    cands.append((bm2, bn2, bk2))
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


def matmul_task(M: int, K: int, N: int, fused: bool = True,
                candidates: Sequence[tuple[int, int, int]] | None = None,
                weight: int = 1):
    """(workload, configs, measure, meta_fn, weight) for a matmul workload —
    the task unit consumed by schedule_tune (tune/schedule.py) and by
    tune_matmul's own loop."""
    import jax.numpy as jnp

    from ..ops.pallas.matmul_int8 import qmatmul_int8
    from ..ops.pallas.qms32 import plan_requantize

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.integers(-127, 127, (M, K)).astype(np.int8))
    # B stays a HOST array: a device array captured by the jitted closure is
    # embedded as an MLIR constant, and the device->host fetch inside
    # .lower() wedges over the tunnel (observed v5e hang)
    B = rng.integers(-127, 127, (K, N)).astype(np.int8)
    mult = shift = None
    if fused:
        mult, shift = plan_requantize(0.0004, 0.05)

    workload = matmul_workload(M, K, N, fused)
    cands = list(candidates or matmul_candidates(M, K, N)) + ["xla"]
    configs = [{"impl": "xla"} if c == "xla" else {"blocks": list(c)}
               for c in cands]

    def measure(cfg):
        blocks = tuple(cfg["blocks"]) if "blocks" in cfg else "xla"

        def fn(a, _blocks=blocks):
            if fused:
                return qmatmul_int8(a, B, multiplier=mult, shift=shift,
                                    blocks=_blocks)
            return qmatmul_int8(a, B, blocks=_blocks)

        return _measure_scan(fn, A)

    meta_fn = lambda t: {"tops": round(2 * M * K * N / t / 1e12, 2)}
    return workload, configs, measure, meta_fn, weight


def tune_matmul(
    M: int, K: int, N: int, db: TuneDatabase,
    fused: bool = False,
    candidates: Sequence[tuple[int, int, int]] | None = None,
    verbose: bool = True,
    strategy: str = "auto",
) -> TuneRecord | None:
    """Search matmul blockings on the current default device.

    strategy: 'grid' measures every candidate; 'model' ranks by the learned
    cost model (tune/model.py) and early-stops; 'auto' uses the model when
    the database has enough records to fit one."""
    workload, configs, measure, _meta, _w = matmul_task(
        M, K, N, fused=fused, candidates=candidates)

    from .model import fit_from_db, model_search

    if strategy == "evolve":
        from .evolutionary import evolutionary_search

        best, n = evolutionary_search(
            workload, configs, measure, db, verbose=verbose,
            meta_fn=lambda t: {"tops": round(2 * M * K * N / t / 1e12, 2)})
        if verbose:
            print(f"  {workload}: evolutionary search measured {n} configs",
                  flush=True)
        return best

    if strategy == "model" or (strategy == "auto"
                               and fit_from_db(db) is not None):
        best, trials = model_search(
            workload, configs, measure, db, verbose=verbose,
            meta_fn=lambda t: {"tops": round(2 * M * K * N / t / 1e12, 2)})
        if verbose:
            print(f"  {workload}: model search measured {trials}/"
                  f"{len(configs)} candidates", flush=True)
        return best

    for cfg in configs:
        t, err, msg = measure(cfg)
        rec = TuneRecord(
            workload, cfg,
            t * 1e3 if t != float("inf") else float("inf"), err, msg,
            meta={"tops": round(2 * M * K * N / t / 1e12, 2)} if err == NO_ERROR else {},
        )
        db.add(rec)
        if verbose:
            status = (f"{t*1e6:.1f} us ({rec.meta.get('tops', 0)} TOPS)"
                      if err == NO_ERROR else f"err{err}")
            print(f"  {workload} {cfg}: {status}", flush=True)
    return db.best(workload)


def conv_flat_candidates(mp, cin_p, cout_p, khp, kwp, fhx) -> list[tuple[int, int, int]]:
    from ..ops.pallas.conv_flat import _VMEM_BUDGET

    cands = []
    bks = [b for b in (256, 512) if b <= cin_p and cin_p % b == 0] or [min(cin_p, 128)]
    for bk in bks:
        if bk > cin_p or cin_p % bk:
            continue
        for bn in (128, 256, 512):
            if bn > cout_p or cout_p % bn:
                continue
            for bm in (512, 1024, 2048):
                if bm > mp:
                    continue
                vm = (2 * fhx * bk + 2 * khp * kwp * bk * bn
                      + bm * bn * 4 + 2 * bm * bn)
                if vm <= _VMEM_BUDGET:
                    cands.append((bm, bn, bk))
    return sorted(set(cands))


def conv_flat_task(shape: tuple, wshape: tuple, strides, padding, groups,
                   weight: int = 1):
    """(workload, configs, measure, meta_fn, weight) for a conv workload,
    or None when the flat kernel does not support the geometry."""
    import jax.numpy as jnp

    from ..ops.pallas.conv_flat import (
        _flat_lengths,
        _phase_geometry,
        flat_conv_workload,
        qconv2d_flat,
        qconv2d_flat_supported,
    )
    from ..ops.pallas.matmul_int8 import _round_up
    from ..ops.pallas.qms32 import plan_requantize

    n, h, w, cin = shape
    kh, kw, wcin, cout = wshape
    sh, sw = strides
    workload = flat_conv_workload(n, h, w, cin, cout, kh, kw, strides, True,
                                  groups)
    if not qconv2d_flat_supported(shape, wshape, strides, padding, groups):
        return None
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 127, shape).astype(np.int8))
    wt = rng.integers(-127, 127, wshape).astype(np.int8)  # host (see above)
    m, s = plan_requantize(0.0004, 0.05)

    if groups == 1 and (kh, kw) != (1, 1):
        oh, ow, khp, kwp, hph, wph = _phase_geometry(h, w, kh, kw, sh, sw, padding)
        wph = _round_up(wph, 4)
        cin_p = _round_up(sh * sw * cin, 128)
        cout_p = _round_up(cout, 128)
        fh, mp, fhx = _flat_lengths(n, hph, wph, khp, kwp, 512)
        cands = conv_flat_candidates(mp, cin_p, cout_p, khp, kwp, fhx)
    else:
        cands = [None]  # matmul-routed 1x1 / depthwise: single internal config

    macs = n * ((h + padding[0] + padding[2] - kh) // sh + 1) * (
        (w + padding[1] + padding[3] - kw) // sw + 1
    ) * cout * kh * kw * (cin // groups)
    layouts = [None, "t"] if (groups == 1 and (kh, kw) != (1, 1)) else [None]
    configs = []
    for blocks in cands:
        for layout in layouts:
            cfg = {"blocks": list(blocks)} if blocks else {"kernel": "routed"}
            if layout:
                cfg["layout"] = layout
            configs.append(cfg)

    def measure(cfg):
        blocks = tuple(cfg["blocks"]) if "blocks" in cfg else None
        layout = cfg.get("layout")

        def fn(a, _blocks=blocks, _layout=layout):
            return qconv2d_flat(a, wt, multiplier=m, shift=s,
                                strides=tuple(strides), padding=tuple(padding),
                                groups=groups, blocks=_blocks, layout=_layout)

        return _measure_scan(fn, x)

    meta_fn = lambda t: {"tops": round(2 * macs / t / 1e12, 2)}
    return workload, configs, measure, meta_fn, weight


def tune_conv_flat(
    shape: tuple, wshape: tuple, strides, padding, groups, db: TuneDatabase,
    verbose: bool = True, strategy: str = "auto",
) -> TuneRecord | None:
    """Search the flat conv kernel's (bm, bn, bk, layout) blockings
    (grid, or model-ranked with early stop — see tune_matmul)."""
    task = conv_flat_task(shape, wshape, strides, padding, groups)
    if task is None:
        n, h, w, cin = shape
        kh, kw, _, cout = wshape
        from ..ops.pallas.conv_flat import flat_conv_workload

        workload = flat_conv_workload(n, h, w, cin, cout, kh, kw, strides,
                                      True, groups)
        db.add(TuneRecord(workload, {}, float("inf"), COMPILE_ERROR,
                          "unsupported"))
        return None
    workload, configs, measure, meta_fn, _w = task

    from .model import fit_from_db, model_search

    if len(configs) > 6 and (strategy == "model" or (
            strategy == "auto" and fit_from_db(db) is not None)):
        best, trials = model_search(
            workload, configs, measure, db, verbose=verbose, meta_fn=meta_fn)
        if verbose:
            print(f"  {workload}: model search measured {trials}/"
                  f"{len(configs)} candidates", flush=True)
        return best

    for cfg in configs:
        t, err, msg = measure(cfg)
        rec = TuneRecord(
            workload, cfg,
            t * 1e3 if t != float("inf") else float("inf"), err, msg,
            meta=meta_fn(t) if err == NO_ERROR else {},
        )
        db.add(rec)
        if verbose:
            status = (f"{t*1e6:.1f} us ({rec.meta.get('tops', 0)} TOPS)"
                      if err == NO_ERROR else f"err{err}: {msg[:60]}")
            print(f"  {workload} {cfg}: {status}", flush=True)
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
    wt = rng.integers(-127, 127, wshape).astype(np.int8)  # host (see above)
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


def conv_chain_task(n, h, w, stage_dims, weight: int = 1,
                    bms=(256, 512, 1024), bn_caps=(128, 256)):
    """(workload, configs, measure, meta_fn, weight) for a frame-chain
    geometry (stage_dims = [(kh, cin, cout), ...], 'same' padding)."""
    import jax.numpy as jnp

    from ..ops.pallas.conv_flat import chain_workload, qconv2d_flat_chain
    from ..ops.pallas.qms32 import plan_requantize

    workload = chain_workload(n, h, w, stage_dims)
    rng = np.random.default_rng(0)
    m, s = plan_requantize(0.0004, 0.05)
    stages = []
    for (kh, ci, co) in stage_dims:
        pad = kh // 2
        stages.append(dict(
            w=rng.integers(-127, 127, (kh, kh, ci, co)).astype(np.int8),
            bias=rng.integers(-500, 500, (co,)).astype(np.int32),
            multiplier=m, shift=s, izp=0, out_zp=0,
            padding=(pad, pad, pad, pad)))
    x = jnp.asarray(rng.integers(-127, 127,
                                 (n, h, w, stage_dims[0][1])).astype(np.int8))
    macs = sum(n * h * w * co * kh * kh * ci for (kh, ci, co) in stage_dims)
    configs = [{"bm": bm, "bn": bn} for bm in bms for bn in bn_caps]

    def measure(cfg):
        def fn(a, _bm=cfg["bm"], _bn=cfg["bn"]):
            return qconv2d_flat_chain(a, stages, bm=_bm, bn_cap=_bn)

        return _measure_scan(fn, x)

    meta_fn = lambda t: {"tops": round(2 * macs / t / 1e12, 2)}
    return workload, configs, measure, meta_fn, weight


def tune_conv_chain(n, h, w, stage_dims, db: TuneDatabase,
                    verbose: bool = True,
                    bms=(256, 512, 1024),
                    bn_caps=(128, 256)) -> TuneRecord | None:
    # bm=256 joined the space with the minimal-hp tail-pad geometry: at
    # small spatial extents (H14/H7) the bm-granular lead block + grid
    # round-up dominate the MAC waste (b8 H14: 0.51 useful at bm=512 vs
    # 0.61 at bm=256), and only a measurement can arbitrate that against
    # the per-dot efficiency loss of shorter M blocks.
    """Tune the frame-chain block size bm for a chain geometry.

    stage_dims = [(kh, cin, cout), ...] with 'same' padding per stage (the
    shape fuse_conv_chains produces for ResNet-style bottlenecks)."""
    workload, configs, measure, meta_fn, _w = conv_chain_task(
        n, h, w, stage_dims, bms=bms, bn_caps=bn_caps)
    for cfg in configs:
        t, err, msg = measure(cfg)
        rec = TuneRecord(
            workload, cfg,
            t * 1e3 if t != float("inf") else float("inf"), err, msg,
            meta=meta_fn(t) if err == NO_ERROR else {},
        )
        db.add(rec)
        if verbose:
            status = (f"{t*1e6:.1f} us ({rec.meta.get('tops', 0)} TOPS)"
                      if err == NO_ERROR else f"err{err}: {msg[:60]}")
            print(f"  {workload} {cfg}: {status}", flush=True)
    return db.best(workload)


def conv_stack_task(n, h, w, block_dims, weight: int = 1,
                    bms=(256, 512, 1024), bn_caps=(128, 256)):
    """(workload, configs, measure, meta_fn, weight) for a residual-block
    STACK geometry (block_dims = [[(kh, cin, cout), ...] per block], every
    block an identity residual, 'same' padding)."""
    import jax.numpy as jnp

    from ..ops.pallas.conv_flat import (qconv2d_flat_block_stack,
                                        stack_workload)
    from ..ops.pallas.qms32 import plan_requantize

    workload = stack_workload(n, h, w, block_dims)
    rng = np.random.default_rng(0)
    m, s = plan_requantize(0.0004, 0.05)
    blocks = []
    for dims in block_dims:
        stages = []
        for (kh, ci, co) in dims:
            pad = kh // 2
            stages.append(dict(
                w=rng.integers(-127, 127, (kh, kh, ci, co)).astype(np.int8),
                bias=rng.integers(-500, 500, (co,)).astype(np.int32),
                multiplier=m, shift=s, izp=0, out_zp=0,
                padding=(pad, pad, pad, pad)))
        rp = dict(lhs_scale=0.05, lhs_zero_point=0, rhs_scale=0.04,
                  rhs_zero_point=0, output_scale=0.04,
                  output_zero_point=0, rounding="UPWARD")
        blocks.append((stages, rp))
    x = jnp.asarray(rng.integers(
        -127, 127, (n, h, w, block_dims[0][0][1])).astype(np.int8))
    macs = sum(n * h * w * co * kh * kh * ci
               for dims in block_dims for (kh, ci, co) in dims)
    configs = [{"bm": bm, "bn": bn} for bm in bms for bn in bn_caps]

    def measure(cfg):
        def fn(a, _bm=cfg["bm"], _bn=cfg["bn"]):
            return qconv2d_flat_block_stack(a, blocks, bm=_bm, bn_cap=_bn)

        return _measure_scan(fn, x)

    meta_fn = lambda t: {"tops": round(2 * macs / t / 1e12, 2)}
    return workload, configs, measure, meta_fn, weight
