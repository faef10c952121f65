"""Device timing utilities.

The role of the reference's `time_evaluator` adaptive loop
(`python/tvm/runtime/module.py:273`), adapted to two TPU realities:
  * dispatch latency (especially over a tunneled device) can exceed kernel
    time by orders of magnitude, so kernels are iterated INSIDE one jitted
    program (lax.scan with a forced data dependence to defeat loop-invariant
    hoisting) rather than timed per dispatch;
  * wall-clock jitter is handled by differential measurement: time two
    iteration counts and divide the difference, min over repeats.
"""

from __future__ import annotations

import time
from typing import Callable


def time_jitted(run: Callable[[], None], warmup: int = 2, repeats: int = 5) -> float:
    """Best-of-repeats wall time of run() (which must block until ready)."""
    for _ in range(warmup):
        run()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def time_iterated(make_run: Callable[[int], Callable[[], None]],
                  lo: int = 8, hi: int = 40, repeats: int = 4) -> float:
    """Per-iteration time via differential measurement.

    make_run(n) returns a nullary blocking callable executing the workload n
    times inside ONE device program.  Returns (t(hi) - t(lo)) / (hi - lo)
    using best-of-repeats for each, which cancels fixed dispatch overhead.
    """
    r_lo, r_hi = make_run(lo), make_run(hi)
    t_lo = time_jitted(r_lo, warmup=1, repeats=repeats)
    t_hi = time_jitted(r_hi, warmup=1, repeats=repeats)
    per = (t_hi - t_lo) / (hi - lo)
    # fall back to the amortized estimate if jitter made the diff nonsense
    if per <= 0:
        per = t_hi / hi
    return per


def scan_loop(fn, feedback, init, iters: int):
    """Build `init -> fn applied iters times` with a forced sequential data
    dependence: feedback(x, out) -> next x (must be cheap and keep dtype).

    Prevents XLA from hoisting the loop-invariant computation out of the
    scan, which otherwise silently turns an N-iteration benchmark into one
    iteration."""
    import jax
    from jax import lax

    def body(x, _):
        out = fn(x)
        return feedback(x, out), None

    def run(x0):
        x, _ = lax.scan(body, x0, None, length=iters)
        return x

    return jax.jit(run).lower(init).compile()


def per_iter_scan(fn, x0, feedback, iters_lo: int = 8,
                  iters_hi: int | None = None, repeats: int = 4) -> float:
    """Per-iteration kernel time via the scan + differential protocol.

    feedback(x, out) must consume the FULL output (e.g. a shape-matched xor)
    — a scalar-reduced feedback lets XLA narrow the computation and fakes
    impossible throughputs (observed on v5e).

    iters_hi=None (default) picks the high count ADAPTIVELY so the
    differential (iters_hi - iters_lo) * per_iter clears the dispatch jitter
    (~1-3 ms over the tunnel): fast kernels otherwise read as the dispatch
    floor divided by the iteration count (observed: every sub-50us kernel
    'measuring' ~620 us = 25 ms / 40)."""

    def make(iters):
        c = scan_loop(fn, feedback, x0, iters)
        return lambda: c(x0).block_until_ready()

    t_lo = time_jitted(make(iters_lo), warmup=1, repeats=repeats)
    if iters_hi is not None:
        t_hi = time_jitted(make(iters_hi), warmup=1, repeats=repeats)
        per = (t_hi - t_lo) / (iters_hi - iters_lo)
        return per if per > 0 else t_hi / iters_hi
    # escalate the iteration count until the differential clears 10 ms
    # (each level costs one compile; fast kernels need ~512-4096 iters)
    for iters in (128, 512, 2048, 4096):
        t_hi = time_jitted(make(iters), warmup=1, repeats=repeats)
        if t_hi - t_lo >= 0.01 or iters >= 4096:
            per = (t_hi - t_lo) / (iters - iters_lo)
            return per if per > 0 else t_hi / iters
    return t_lo / iters_lo  # unreachable


def per_iter_host_chain(run_once, x0, feedback, repeats: int = 3,
                        target_s: float = 0.5, max_n: int = 256) -> float:
    """Per-iteration time for a HOST-COMPOSED pipeline (e.g. the segmented
    executor, whose model run is a chain of per-segment jit dispatches that
    must NOT be re-inlined into one scan program — that would rebuild the
    oversized unrolled program segmentation exists to avoid).

    run_once(x) -> device output; feedback(x, out) -> next x (jitted, tiny).
    Same differential protocol as per_iter_chain: async dispatches pipeline
    over the tunnel, the final np.asarray is the true sync, and T(1+n)-T(1)
    cancels fixed dispatch cost."""
    import numpy as np

    def T(n):
        best = float("inf")
        for _ in range(repeats):
            x = x0
            t0 = time.perf_counter()
            for _ in range(n):
                x = feedback(x, run_once(x))
            np.asarray(x)
            best = min(best, time.perf_counter() - t0)
        return best

    np.asarray(feedback(x0, run_once(x0)))  # warm: compile every segment
    t1 = T(1)
    n = 4
    while True:
        t2 = T(1 + n)
        if t2 - t1 >= target_s or n >= max_n:
            per = (t2 - t1) / n
            if per <= 0:
                per = t2 / (1 + n)
            return per
        n *= 4


def _small_sync(x):
    """True remote-execution sync with a TINY d2h fetch: a jitted 1-element
    slice DEPENDS on the full chain, so fetching its value awaits the chain
    — without pulling the whole carried array through the ~29 MB/s tunnel
    (a multi-MB np.asarray sync has 100s-of-ms fetch variance that swamps
    the timing differential; observed 100x-wrong medians on 33 MB carries)."""
    import jax
    import numpy as np

    fn = _small_sync._cache.get(id(type(x)))
    if fn is None:
        fn = jax.jit(lambda v: v.reshape(-1)[:1])
        _small_sync._cache[id(type(x))] = fn
    return np.asarray(fn(x))


_small_sync._cache = {}


def per_iter_chain_samples(fn, x0, feedback, scan_len: int = 64,
                           samples: int = 5, target_s: float = 0.08,
                           max_n: int = 1024) -> list[float]:
    """Distribution-disciplined variant of per_iter_chain: returns a LIST of
    `samples` independent per-iteration estimates taken back-to-back inside
    ONE process, each pairing a fresh 1-dispatch baseline with a fresh
    (1+n)-dispatch chain.  Tunnel drift (measured ±15% run-to-run with 2x
    outliers) then lands in the reported spread instead of silently biasing
    a single capture; callers report median + IQR via `median_iqr` (the
    reference's time_evaluator number/repeat protocol likewise reports
    per-repeat statistics, `python/tvm/runtime/module.py:273`)."""
    c = scan_loop(fn, feedback, x0, scan_len)

    def T(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = c(x)
        _small_sync(x)  # true sync via a 1-element dependent fetch
        return time.perf_counter() - t0

    _small_sync(c(x0))  # warm (first real execution)
    # escalate the chain length ONCE until the differential clears target_s
    t1 = min(T(1), T(1))
    n = 4
    while True:
        t2 = T(1 + n)
        if t2 - t1 >= target_s or n >= max_n:
            break
        n *= 4

    out = []
    for _ in range(max(1, samples)):
        a = T(1)          # fresh interleaved baseline per sample
        b = T(1 + n)
        per = (b - a) / (n * scan_len)
        out.append(per if per > 0 else b / ((1 + n) * scan_len))
    return out


def per_iter_chain_samples_multi(fns: dict, x0, feedback,
                                 scan_len: int = 64, samples: int = 5,
                                 target_s: float = 0.08,
                                 max_n: int = 1024) -> dict:
    """Interleaved multi-variant sampling: one round-robin pass per sample
    over every variant in `fns` (name -> fn), so slow tunnel drift hits all
    variants equally and their DIFFERENCES stay clean (the repo's standard
    decision methodology, promoted here into a reusable protocol).  Returns
    {name: [per_iter_samples...]}."""
    import numpy as np

    compiled, chain_n = {}, {}
    for name, fn in fns.items():
        c = scan_loop(fn, feedback, x0, scan_len)
        _small_sync(c(x0))  # warm

        def T(n, _c=c):
            x = x0
            t0 = time.perf_counter()
            for _ in range(n):
                x = _c(x)
            _small_sync(x)  # true sync via a 1-element dependent fetch
            return time.perf_counter() - t0

        t1 = min(T(1), T(1))
        n = 4
        while True:
            t2 = T(1 + n)
            if t2 - t1 >= target_s or n >= max_n:
                break
            n *= 4
        compiled[name], chain_n[name] = T, n

    out = {name: [] for name in fns}
    for _ in range(max(1, samples)):
        for name in fns:  # round-robin: every variant sampled each pass
            T, n = compiled[name], chain_n[name]
            a, b = T(1), T(1 + n)
            per = (b - a) / (n * scan_len)
            out[name].append(per if per > 0
                             else b / ((1 + n) * scan_len))
    return out


def median_iqr(xs) -> tuple[float, float]:
    """(median, interquartile range) of a sample list."""
    import numpy as np

    arr = np.asarray(sorted(xs), dtype=np.float64)
    return (float(np.median(arr)),
            float(np.percentile(arr, 75) - np.percentile(arr, 25)))


def per_iter_chain(fn, x0, feedback, scan_len: int = 64, repeats: int = 3,
                   target_s: float = 0.08) -> float:
    """Per-iteration kernel time: chain n async dispatches of ONE compiled
    scan and difference against the 1-dispatch time, syncing by FETCHING the
    final value.

    Two tunnel realities this accounts for (measured on the axon v5e):
      * block_until_ready returns before remote execution completes — only a
        device->host value fetch is a true sync, so T(n) ends with
        np.asarray(x);
      * per-dispatch RTT is ~24 ms but async dispatches pipeline, so the
        chain exposes per-iteration time without per-length recompiles.
    n escalates (no recompile) until the differential clears target_s."""
    import numpy as np

    c = scan_loop(fn, feedback, x0, scan_len)

    def T(n):
        best = float("inf")
        for _ in range(repeats):
            x = x0
            t0 = time.perf_counter()
            for _ in range(n):
                x = c(x)
            np.asarray(x)  # true sync: full value fetch
            best = min(best, time.perf_counter() - t0)
        return best

    np.asarray(c(x0))  # warm (first real execution)
    t1 = T(1)
    n = 4
    while True:
        t2 = T(1 + n)
        if t2 - t1 >= target_s or n >= 1024:
            per = (t2 - t1) / (n * scan_len)
            if per <= 0:
                per = t2 / ((1 + n) * scan_len)
            return per
        n *= 4
