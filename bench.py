"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json + BASELINE.md "Headline anchoring"): int8 conv
GOPS/chip vs the MXU roofline measured on the stage-resident conv CHAIN at a
ResNet-50 stage shape — the per-conv cost a real model pays (activations stay
in kernel layout across the stage; entry/exit amortized).  The lone-NHWC-call
wrapper is kept as the `mxu_roofline_frac` sub-metric: it is HBM-pad bound at
~0.45 of roofline and no model executes it per conv.  Extras record the raw
kernel, int8 matmul throughput, model e2e, and full-graph int8 trace
generation (traces/sec) for quantized ResNet-50.

Robustness (the reference analog is autotvm's measurement isolation,
`autotvm/measure/measure_methods.py:74,216` — build/run in killable workers,
errors are data): the axon TPU tunnel can be wedged or dead when the driver
runs this.  Structure:

  supervisor (this process, never touches the TPU)
    ├ probe loop: `jax.devices()` in a SUBPROCESS with a hard timeout,
    │   bounded retries with cooldown (scripts/tpu_recovery_queue.sh logic)
    ├ payload attempts: `python bench.py --payload <state.json>` — a
    │   subprocess that runs each sub-benchmark and CHECKPOINTS results to
    │   the state file after each one; a wedge/crash loses only the
    │   in-flight sub-bench, and the next attempt skips completed ones
    └ final emit: ONE JSON line assembled from the state file — partial
        results if sub-benches died, zeros if everything did; never nothing.

Methodology notes (see tachikoma_tpu/utils/timing.py): kernels are iterated
INSIDE one jitted lax.scan with a full-output data dependence (feedback
xors the output into the next input) so neither dispatch latency nor XLA
loop-invariant hoisting/dead-code elimination corrupts the measurement;
per-iteration time is the difference quotient between two iteration counts.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# TPU v5e public peak throughput per chip.
V5E_INT8_TOPS = 394.7
V5E_BF16_TFLOPS = 197.0

# supervisor budgets (seconds; env-overridable for tests)
PROBE_TIMEOUT = 150
PROBE_SLEEP = 90
MAX_PROBES = 8
PAYLOAD_TIMEOUT = 2700  # 8 sub-benches; a full cold run measured ~35 min
COOLDOWN = int(os.environ.get("TK_BENCH_COOLDOWN", "150"))
DEADLINE = 80 * 60  # overall wall-clock cap for the whole harness

_ALL_SUBBENCHES = ("conv", "conv_kernel", "matmul", "chain", "stack",
                   "resnet50", "resnet50_b32", "trace")
# TK_BENCH_ONLY=conv,chain restricts the run (smoke tests / reruns)
SUBBENCH_KEYS = tuple(
    k for k in _ALL_SUBBENCHES
    if k in os.environ.get("TK_BENCH_ONLY", ",".join(_ALL_SUBBENCHES)
                           ).split(","))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# payload: the only code that touches the TPU (run as a subprocess)
# ---------------------------------------------------------------------------

def _per_iter_stats(fn, x0, feedback, samples=5):
    """(median_s, iqr_s) per-iteration time over >= `samples` interleaved
    repeats inside ONE process (utils/timing.py per_iter_chain_samples).

    The chain + value-fetch protocol: dispatches pipeline over the tunnel
    and only a d2h fetch is a true sync.  The tunnel drifts ±15% run-to-run
    with occasional 2x outliers, so the official capture is the MEDIAN with
    the IQR reported alongside (the reference's time_evaluator
    number/repeat protocol, `python/tvm/runtime/module.py:273`)."""
    from tachikoma_tpu.utils.timing import median_iqr, per_iter_chain_samples

    xs = per_iter_chain_samples(fn, x0, feedback, samples=samples)
    return median_iqr(xs)


def bench_int8_conv_pallas():
    """ResNet-50 stage-2 shaped conv (8x56x56x128 -> 3x3x128x128) via the
    flat shifted-matmul Pallas kernel with fused requantize."""
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize

    n, h, w, cin, cout, k = 8, 56, 56, 128, 128, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 127, (n, h, w, cin)).astype(np.int8))
    # weights stay host-side: device arrays captured in a jitted closure
    # deadlock .lower() over the tunnel (MLIR constant embedding does d2h)
    wt = rng.integers(-127, 127, (k, k, cin, cout)).astype(np.int8)
    m, s = plan_requantize(0.0004, 0.05)

    def fn(a):
        return qconv2d_flat(a, wt, multiplier=m, shift=s,
                            strides=(1, 1), padding=(1, 1, 1, 1))

    # feedback forces a sequential data dependence through ONE output
    # element.  The Pallas kernel is an opaque custom call, so XLA cannot
    # narrow it — every iteration computes and materializes the full output
    # regardless — and this matches the reference's time_evaluator, which
    # never fetches outputs between iterations
    # (`python/tvm/runtime/module.py:273`).
    def feedback(a, out):
        return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0])

    per, iqr = _per_iter_stats(fn, x, feedback)
    macs = n * h * w * cout * k * k * cin
    return {"gops": 2 * macs / per / 1e9, "time_s": per, "iqr_s": iqr}


def bench_int8_conv_kernel():
    """Raw flat-conv kernel at the headline geometry on its REQUIRED layout
    (flat padded image built once outside the timing loop) — the autotvm
    measurement parity point: the reference's time_evaluator feeds each
    tuned kernel the layout its schedule demands and measures the kernel
    alone (`python/tvm/autotvm/measure/measure_methods.py:216`)."""
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import (_build_flat_conv,
                                                    _flat_lengths, _round_up)
    from tachikoma_tpu.ops.pallas.matmul_int8 import _x32_tracing
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize

    n, h, w, cin, cout, k = 8, 56, 56, 128, 128, 3
    # flexible bm (round-5 kernel probe, all variants bit-verified): bm
    # need not be a power of two — any multiple of 32 that DIVIDES the
    # n*fh row count makes the grid round-up zero (useful rows 0.875 ->
    # 0.901; measured best 27.5 us vs 28.1 at pow2-bm1024)
    bm = 1856
    rng = np.random.default_rng(0)
    x = rng.integers(-127, 127, (n, h, w, cin)).astype(np.int8)
    wt = rng.integers(-127, 127, (k, k, cin, cout)).astype(np.int8)
    mult, shift = plan_requantize(0.0004, 0.05)

    pad = k // 2
    hph, wph = h + 2 * pad, _round_up(w + 2 * pad, 4)
    cin_p, cout_p = _round_up(cin, 128), _round_up(cout, 128)
    fh, mp, fhx = _flat_lengths(n, hph, wph, k, k, bm)
    assert mp == n * fh, "bm must divide n*fh exactly (flex-bm geometry)"
    xpad = np.zeros((n, hph, wph, cin), np.int8)
    xpad[:, pad:pad + h, pad:pad + w, :] = x
    xf = np.zeros((fhx, cin_p), np.int8)
    xf[: n * fh, :cin] = xpad.reshape(n * fh, cin)

    wfull = np.zeros((k, k, cin_p, cout_p), np.int8)
    wfull[:, :, :cin, :cout] = wt
    from tachikoma_tpu.ops.pallas.conv_flat import _pack_rq

    m_arr = np.full((cout,), mult, np.int32)
    s_arr = np.full((cout,), shift, np.int32)
    rq_mode, mx = _pack_rq(m_arr, s_arr, 0, -128, 127, "UPWARD",
                           cout, cout_p)
    m1 = mx if rq_mode else np.broadcast_to(np.int32(mult), (1, cout_p))
    s1 = np.broadcast_to(np.int32(shift), (1, cout_p))
    b1 = np.zeros((1, cout_p), np.int32)
    kern = _build_flat_conv(mp, fhx, cin_p, cout_p, k, k, wph, bm,
                            min(128, cout_p), min(128, cin_p), True, 0,
                            "UPWARD", -128, 127, "int8",
                            (int(shift),), False, None, rq_mode=rq_mode)

    def fn(a):
        with _x32_tracing():
            return kern(a, wfull, b1, m1, s1)

    def feedback(a, out):
        return a.at[0, 0].add(out[0, 0])

    per, iqr = _per_iter_stats(fn, jnp.asarray(xf), feedback)
    macs = n * h * w * cout * k * k * cin
    return {"gops": 2 * macs / per / 1e9, "time_s": per, "iqr_s": iqr}


def bench_int8_matmul_pallas():
    """4096^3 int8 matmul through the PUBLIC fused API (tune-DB blocks +
    clamped requantize epilogue) — what qnn.dense actually serves."""
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.matmul_int8 import qmatmul_int8
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize

    M = K = N = 4096
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.integers(-127, 127, (M, K)).astype(np.int8))
    B = rng.integers(-127, 127, (K, N)).astype(np.int8)  # host (see conv note)
    mult, shift = plan_requantize(0.0004, 0.05)

    def fn(a):
        return qmatmul_int8(a, B, multiplier=int(mult), shift=int(shift))

    # single-element dependence: see bench_int8_conv_pallas (the kernel is
    # opaque to XLA; the reference's time_evaluator fetches nothing per iter)
    def feedback(a, out):
        return a.at[0, 0].add(out[0, 0].astype(jnp.int8))

    per, iqr = _per_iter_stats(fn, A, feedback)
    return {"gops": 2 * M * K * N / per / 1e9, "time_s": per, "iqr_s": iqr}


def bench_conv_chain():
    """Graph-resident conv number: per-conv time INSIDE a frame chain at the
    headline geometry, by depth differential (d=6 vs d=3 totals).  Entry pad
    and exit extraction are fixed costs shared by both depths; the
    differential cancels them exactly — the same cut-point-ablation
    methodology runtime/profiler.py uses for models (the reference's
    time_evaluator likewise measures kernels on their required layouts,
    `python/tvm/runtime/module.py:273`).  Also reports the depth-6 average
    (entry/exit included) as `gops_e2e_d6`."""
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat_chain
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize

    n, h, w, c = 8, 56, 56, 128
    rng = np.random.default_rng(0)
    m, s = plan_requantize(0.0004, 0.05)
    mk_stage = lambda: dict(
        w=rng.integers(-127, 127, (3, 3, c, c)).astype(np.int8),
        bias=rng.integers(-500, 500, (c,)).astype(np.int32),
        multiplier=m, shift=s, izp=0, out_zp=0, padding=(1, 1, 1, 1))
    stages6 = [mk_stage() for _ in range(6)]
    x = jnp.asarray(rng.integers(-127, 127, (n, h, w, c)).astype(np.int8))

    def feedback(a, out):
        return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0])

    from tachikoma_tpu.utils.timing import (median_iqr,
                                            per_iter_chain_samples_multi)

    # ONE tuned geometry for both depths: the d6-d3 differential cancels
    # entry/exit only when both chains share bm/bn (separate DB lookups can
    # pick different blockings per depth, breaking the cancellation)
    from tachikoma_tpu.ops.pallas.conv_flat import chain_workload
    from tachikoma_tpu.tune.database import lookup_config

    cfg = lookup_config(chain_workload(n, h, w, [(3, c, c)] * 6)) or {}
    bm6 = int(cfg.get("bm", 512))
    bn6 = int(cfg.get("bn", 128))
    fns = {}
    for depth in (3, 6):
        st = stages6[:depth]
        fns[depth] = lambda a, _st=st: qconv2d_flat_chain(
            a, _st, bm=bm6, bn_cap=bn6)
    # INTERLEAVED sampling: each sample pass measures d3 then d6, so tunnel
    # drift cancels in the per-sample differential
    samp = per_iter_chain_samples_multi(fns, x, feedback, samples=5)
    diffs = [(t6 - t3) / 3 for t3, t6 in zip(samp[3], samp[6])]
    per, iqr = median_iqr(diffs)               # interior per-conv
    per_d6, iqr_d6 = median_iqr([t / 6 for t in samp[6]])
    # tunnel variance guard: the differential of two noisy totals can
    # collapse or explode on a bad run; it is only credible when it lands
    # between half and 1x the depth-6 average (entry/exit are nonnegative)
    if not (0.5 * per_d6 <= per <= per_d6):
        per, iqr = per_d6, iqr_d6
    macs = n * h * w * c * 9 * c
    return {"gops": 2 * macs / per / 1e9, "time_s": per, "iqr_s": iqr,
            "gops_e2e_d6": 2 * macs / per_d6 / 1e9, "time_d6_s": per_d6}


def bench_conv_stack():
    """Stage-persistent residual-block STACK at the ResNet-50 28^2 stage
    shape (3 identity bottlenecks C512/mid128) — the round-5 layout
    discipline: one entry/exit for the whole stage, fused residual adds
    reading the block-input frame in-register.  Production-realistic
    requantize ratios (weight scale included — shift -4..-8, the clamped
    epilogue window real conv layers land in)."""
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat_block_stack
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize

    n, hw, cin, mid = 8, 28, 512, 128
    rng = np.random.default_rng(0)
    m, s = plan_requantize(0.0004, 0.05)

    def mk(kh, ci, co, izp, ozp):
        pad = kh // 2
        return dict(
            w=rng.integers(-127, 127, (kh, kh, ci, co)).astype(np.int8),
            bias=rng.integers(-500, 500, (co,)).astype(np.int32),
            multiplier=m, shift=s, izp=izp, out_zp=ozp,
            padding=(pad, pad, pad, pad))

    blocks = []
    izp = 0
    for _ in range(3):
        sts = [mk(1, cin, mid, izp, 0), mk(3, mid, mid, 0, 0),
               mk(1, mid, cin, 0, 0)]
        rp = dict(lhs_scale=0.05, lhs_zero_point=0, rhs_scale=0.04,
                  rhs_zero_point=izp, output_scale=0.04,
                  output_zero_point=0, rounding="UPWARD")
        blocks.append((sts, rp))
        izp = 0
    x = jnp.asarray(rng.integers(-127, 127,
                                 (n, hw, hw, cin)).astype(np.int8))

    def fn(a):
        return qconv2d_flat_block_stack(a, blocks)

    def feedback(a, out):
        return a ^ (out & 1)

    per, iqr = _per_iter_stats(fn, x, feedback)
    macs = sum(n * hw * hw * st["w"].shape[3] * st["w"].shape[0] ** 2
               * st["w"].shape[2] for (sts, _) in blocks for st in sts)
    return {"gops": 2 * macs / per / 1e9, "time_s": per, "iqr_s": iqr}


def _bench_resnet50_batch(batch):
    """Quantized+fused ResNet-50 end-to-end latency at a given batch, plus
    the static graph op count for MFU reporting."""
    import jax.numpy as jnp

    from tachikoma_tpu.models.vision import resnet
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.runtime.executor import JaxExecutor
    from tachikoma_tpu.runtime.profiler import graph_flops

    log(f"bench: building + quantizing ResNet-50 b{batch} ...")
    g = resnet(50, batch_size=batch, image_size=224)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, 224, 224, 3)).astype(np.float32)
    qg = quantize(g, [x])
    flops = graph_flops(qg)
    ex = JaxExecutor(qg, fuse=True)
    fn0, params = ex.make_jit_fn()
    vname = ex.graph.inputs[0].name

    def fn(a):
        return fn0(params, {vname: a})[0]

    def feedback(a, out):
        return a.at[0, 0, 0, 0].add(out[0, 0].astype(np.float32))

    per, iqr = _per_iter_stats(fn, jnp.asarray(x), feedback)
    return {"time_s": per, "iqr_s": iqr, "flops": flops, "batch": batch}


def bench_resnet50_e2e():
    return _bench_resnet50_batch(8)


def bench_resnet50_b32():
    """Throughput-oriented batch: MFU is what larger batches buy on a
    394-TOPS part (round-3 verdict item 3)."""
    return _bench_resnet50_batch(32)


def bench_trace_gen():
    """Quantized ResNet-50 full-graph trace generation, traces/sec."""
    import tempfile

    from tachikoma_tpu.models.vision import resnet
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.trace.emitter import TraceEmitter

    log("bench: building + quantizing ResNet-50 ...")
    g = resnet(50, batch_size=1, image_size=224)
    rng = np.random.default_rng(0)
    data = [rng.standard_normal((1, 224, 224, 3)).astype(np.float32)]
    qg = quantize(g, data)
    em = TraceEmitter(qg, backend="jax")
    log("bench: compiling + first trace emit ...")
    # tmpfs when available: the 288 MB trace at disk speed (~300 MB/s) adds
    # ~1 s that says nothing about the emitter
    tdir = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    path = os.path.join(tdir, "tk_bench_trace.bin")
    n_records = em.emit_to(data[0], path)  # native zero-copy writer
    trace_bytes = os.path.getsize(path)
    times, fetches, dispatches = [], [], []
    for _ in range(5):
        t0 = time.perf_counter()
        em.emit_to(data[0], path)
        times.append(time.perf_counter() - t0)
        dispatches.append(em.last_timings.get("dispatch_s", 0.0))
        fetches.append(em.last_timings.get("fetch_s", 0.0))
    from tachikoma_tpu.utils.timing import median_iqr
    t, iqr = median_iqr(times)
    fetched = int(em.last_timings.get("fetched_bytes", 0) or 0)
    fetch_t = median_iqr(fetches)[0]
    os.unlink(path)
    return {"traces_per_sec": n_records / t, "records": n_records,
            "bytes": trace_bytes, "time_s": t, "iqr_s": iqr,
            # attribution: dispatch (device compute enqueue), packed d2h
            # fetch WAIT (async copies overlap the serialize walk), and
            # serialize = remainder (record build + disk write).  The
            # fetched-byte count makes the link-rate claim auditable
            # (round-4 verdict: 288 MB over 2.71 s contradicted the
            # stated 29 MB/s with no byte count to check).
            "dispatch_s": median_iqr(dispatches)[0],
            "fetch_s": fetch_t,
            "serialize_s": t - median_iqr(dispatches)[0] - fetch_t,
            "fetched_bytes": fetched,
            "fetch_mbps": round(fetched / fetch_t / 1e6, 1)
            if fetch_t > 0 else 0.0}


_SUBBENCHES = {
    "conv": bench_int8_conv_pallas,
    "conv_kernel": bench_int8_conv_kernel,
    "matmul": bench_int8_matmul_pallas,
    "chain": bench_conv_chain,
    "stack": bench_conv_stack,
    "resnet50": bench_resnet50_e2e,
    "resnet50_b32": bench_resnet50_b32,
    "trace": bench_trace_gen,
}


def _load_state(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_state(path, state):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, path)


def payload(state_path: str) -> int:
    """Run every not-yet-done sub-benchmark, checkpointing after each."""
    state = _load_state(state_path)
    if os.environ.get("TK_BENCH_CRASH_ONCE"):  # test hook: simulated wedge
        marker = state_path + ".crashed"
        if not os.path.exists(marker):
            open(marker, "w").close()
            log("payload: simulated crash (TK_BENCH_CRASH_ONCE)")
            os._exit(1)

    if os.environ.get("TK_BENCH_FAKE"):
        # test hook: exercise the supervisor/checkpoint/emit machinery
        # without touching jax at all
        subbenches = {k: (lambda k=k: {"gops": 100.0 + len(k),
                                       "time_s": 0.001})
                      for k in _ALL_SUBBENCHES}
        state["device"], state["platform"] = "fake", "tpu"
    else:
        import jax

        if os.environ.get("TK_BENCH_PLATFORM"):  # test hook: payload on CPU
            jax.config.update("jax_platforms",
                              os.environ["TK_BENCH_PLATFORM"])
        cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/tk_jaxcache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        subbenches = _SUBBENCHES
        device = jax.devices()[0]
        state["device"] = str(device)
        state["platform"] = device.platform
        log(f"payload: device {device}")
    _save_state(state_path, state)

    for key in SUBBENCH_KEYS:
        fn = subbenches[key]
        if key in state:
            log(f"payload: {key} already done, skipping")
            continue
        log(f"payload: {key} ...")
        try:
            state[key] = fn()
        except Exception as e:  # noqa: BLE001 — a failed trial is data
            log(f"payload: {key} FAILED: {e!r}")
            state[key] = {"error": repr(e)[:300]}
        _save_state(state_path, state)
    return 0


# ---------------------------------------------------------------------------
# supervisor
# ---------------------------------------------------------------------------

def _probe_tpu() -> bool:
    """One bounded-subprocess backend probe; True iff a TPU answered."""
    code = ("import jax; d = jax.devices()[0]; "
            "print('TK_PROBE', d.platform, flush=True)")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=PROBE_TIMEOUT)
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0 and "TK_PROBE tpu" in (r.stdout or "")


def _emit(state):
    conv = state.get("conv") or {}
    ck = state.get("conv_kernel") or {}
    mm = state.get("matmul") or {}
    chain = state.get("chain") or {}
    stk = state.get("stack") or {}
    r50 = state.get("resnet50") or {}
    r50b32 = state.get("resnet50_b32") or {}
    tr = state.get("trace") or {}
    platform = state.get("platform", "none")
    on_tpu = platform == "tpu"
    roofline_gops = V5E_INT8_TOPS * 1000.0

    def gops(d):
        return float(d.get("gops", 0.0) or 0.0)

    def frac(d):
        return gops(d) / roofline_gops if on_tpu else 0.0

    r50_t = float(r50.get("time_s", 0.0) or 0.0)
    r50b32_t = float(r50b32.get("time_s", 0.0) or 0.0)

    def iqr_ms(d):
        return round(float(d.get("iqr_s", 0.0) or 0.0) * 1000, 4)

    def mfu(d):
        # effective TOPS / MXU int8 peak from the static graph op count
        t = float(d.get("time_s", 0.0) or 0.0)
        f = float(d.get("flops", 0.0) or 0.0)
        return round(f / t / 1e9 / roofline_gops, 4) if (t and on_tpu) else 0.0
    # HEADLINE (re-anchored round 5, see BASELINE.md "Headline anchoring"):
    # the stage-resident chain conv is the number real models pay per conv —
    # activations stay in kernel layout across a whole stage, entry/exit
    # paid once.  The lone-NHWC-call wrapper stays as a sub-metric
    # (mxu_roofline_frac): it is HBM-pad bound at ~0.45 of roofline (the
    # int8 pad alone is 9.26 us vs an 18.7 us kernel SoL, RESULTS.md), a
    # bound no kernel change can move, and no model executes it per-conv.
    head = chain if gops(chain) else conv
    result = {
        "metric": ("int8_conv_chain_gops" if gops(chain)
                   else "int8_conv_gops"),
        "value": round(gops(head), 2),
        "unit": "GOPS",
        "vs_baseline": round(frac(head), 4),
        "extra": {
            "device": state.get("device", "unavailable"),
            "platform": platform,
            "completed": [k for k in SUBBENCH_KEYS
                          if isinstance(state.get(k), dict)
                          and "error" not in state[k]],
            "errors": {k: state[k]["error"] for k in SUBBENCH_KEYS
                       if isinstance(state.get(k), dict)
                       and "error" in state[k]},
            "conv_time_ms": round(float(conv.get("time_s", 0.0)) * 1000, 3),
            "int8_conv_gops": round(gops(conv), 2),
            "mxu_roofline_frac": round(frac(conv), 4),
            "int8_matmul_gops": round(gops(mm), 2),
            "int8_matmul_roofline_frac": round(frac(mm), 4),
            "int8_conv_kernel_gops": round(gops(ck), 2),
            "int8_conv_kernel_roofline_frac": round(frac(ck), 4),
            "int8_conv_chain_gops": round(gops(chain), 2),
            "int8_conv_chain_roofline_frac": round(frac(chain), 4),
            "int8_conv_chain_d6_gops": round(
                float(chain.get("gops_e2e_d6", 0.0) or 0.0), 2),
            "int8_conv_stack_gops": round(gops(stk), 2),
            "int8_conv_stack_roofline_frac": round(frac(stk), 4),
            "stack_time_iqr_ms": iqr_ms(stk),
            "conv_time_iqr_ms": iqr_ms(conv),
            "conv_kernel_time_iqr_ms": iqr_ms(ck),
            "matmul_time_iqr_ms": iqr_ms(mm),
            "chain_time_iqr_ms": iqr_ms(chain),
            "resnet50_e2e_ms_b8": round(r50_t * 1000, 3),
            "resnet50_e2e_iqr_ms_b8": iqr_ms(r50),
            "resnet50_img_per_sec": round(8 / r50_t, 1) if r50_t else 0.0,
            "resnet50_mfu_frac_b8": mfu(r50),
            "resnet50_e2e_ms_b32": round(r50b32_t * 1000, 3),
            "resnet50_e2e_iqr_ms_b32": iqr_ms(r50b32),
            "resnet50_img_per_sec_b32":
                round(32 / r50b32_t, 1) if r50b32_t else 0.0,
            "resnet50_mfu_frac_b32": mfu(r50b32),
            "trace_time_iqr_ms": iqr_ms(tr),
            "resnet50_traces_per_sec":
                round(float(tr.get("traces_per_sec", 0.0) or 0.0), 2),
            "resnet50_trace_records": int(tr.get("records", 0) or 0),
            "resnet50_trace_bytes": int(tr.get("bytes", 0) or 0),
            "resnet50_trace_time_s": round(float(tr.get("time_s", 0.0)
                                                 or 0.0), 3),
            "trace_dispatch_s": round(float(tr.get("dispatch_s", 0.0)
                                            or 0.0), 3),
            "trace_fetch_s": round(float(tr.get("fetch_s", 0.0) or 0.0), 3),
            "trace_serialize_s": round(float(tr.get("serialize_s", 0.0)
                                             or 0.0), 3),
            "trace_fetched_bytes": int(tr.get("fetched_bytes", 0) or 0),
            "trace_fetch_mbps": round(float(tr.get("fetch_mbps", 0.0)
                                            or 0.0), 1),
        },
    }
    print(json.dumps(result), flush=True)


def _complete(state) -> bool:
    return all(isinstance(state.get(k), dict) and "error" not in state[k]
               for k in SUBBENCH_KEYS)


def supervisor() -> int:
    t0 = time.time()
    state_path = os.environ.get("TK_BENCH_STATE",
                                "/tmp/tk_bench_state_%d.json" % os.getpid())
    if os.path.exists(state_path) and not os.environ.get("TK_BENCH_RESUME"):
        os.unlink(state_path)

    env = dict(os.environ)
    env.setdefault("PYTHONPATH", "/root/repo:/root/.axon_site")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tk_jaxcache")

    # phase 1: probe until the backend answers (skippable for CPU testing)
    if env.get("TK_BENCH_PLATFORM"):
        log("supervisor: TK_BENCH_PLATFORM set, skipping TPU probe")
    else:
        for i in range(1, MAX_PROBES + 1):
            if _probe_tpu():
                log(f"supervisor: TPU answered on probe {i}")
                break
            log(f"supervisor: probe {i}/{MAX_PROBES} failed; "
                f"cooldown {PROBE_SLEEP}s")
            if time.time() - t0 > DEADLINE / 2:
                log("supervisor: probe budget exhausted")
                break
            time.sleep(PROBE_SLEEP)
        else:
            log("supervisor: TPU never answered; attempting payload anyway")

    # phase 2: payload attempts with checkpointed resume
    attempt = 0
    while not _complete(_load_state(state_path)):
        attempt += 1
        remaining = DEADLINE - (time.time() - t0)
        if remaining < 120 or attempt > 4:
            log("supervisor: attempt budget exhausted")
            break
        log(f"supervisor: payload attempt {attempt}")
        try:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--payload",
                 state_path],
                timeout=min(PAYLOAD_TIMEOUT, remaining), env=env,
                stdout=sys.stderr, stderr=sys.stderr)
        except subprocess.TimeoutExpired:
            log("supervisor: payload timed out (tunnel wedge?)")
        state = _load_state(state_path)
        if _complete(state):
            break
        # a wedge poisons the NEXT process's first compile: cool down
        log(f"supervisor: state so far {sorted(state)}; "
            f"cooldown {COOLDOWN}s")
        time.sleep(min(COOLDOWN, max(0, DEADLINE - (time.time() - t0))))

    _emit(_load_state(state_path))
    return 0


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--payload":
        sys.exit(payload(sys.argv[2]))
    sys.exit(supervisor())


if __name__ == "__main__":
    main()
