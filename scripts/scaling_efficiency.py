"""Multi-host scaling-efficiency harness (BASELINE: >80% at >=2 hosts).

Spawns real `jax.distributed` process groups ({1,2,4} processes on this
host, each owning a slice of a virtual CPU mesh) and measures the
BASELINE-format numbers for the data-parallel sharded executor and the
sharded trace emitter:

  * weak scaling   — per-process batch fixed; efficiency = T(1)/T(N)
  * strong scaling — global batch fixed;     efficiency = T(1)/(N*T(N))
  * trace gather   — traces/sec through ShardedTraceEmitter's host-0 merge

METHODOLOGY NOTE: CPU-mesh numbers are correctness-shaped, not
performance-shaped — collectives ride shared memory, not ICI/DCN, so the
efficiency figure validates the HARNESS (sharding, process-group wiring,
deterministic gather) and fills in automatically the day real multi-host
TPU hardware runs the same command.  The reference has no analog (its RPC
layer is point-to-point; SURVEY.md §2.5).

Usage:
  python scripts/scaling_efficiency.py [--procs 1,2] [--steps 12]
Prints one JSON line: {"metric": "scaling_efficiency", ...}
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
mode = sys.argv[4]; steps = int(sys.argv[5]); out_path = sys.argv[6]
base_batch = int(sys.argv[7])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
if nproc > 1:
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                               process_id=pid)
import numpy as np
from tachikoma_tpu.models.vision import lenet5
from tachikoma_tpu.quantize.quantizer import quantize
from tachikoma_tpu.parallel.mesh import simple_mesh
from tachikoma_tpu.parallel.shard import ShardedExecutor
from tachikoma_tpu.parallel.gather import ShardedTraceEmitter, is_coordinator

n_dev = len(jax.devices())
dp = n_dev
batch = base_batch * (nproc if mode == "weak" else 1)
if batch % dp:
    batch = ((batch + dp - 1) // dp) * dp
g = lenet5(batch_size=batch)
rng = np.random.default_rng(0)
data = [rng.standard_normal((batch, 28, 28, 1)).astype(np.float32)
        for _ in range(2)]
qg = quantize(g, data)
mesh = simple_mesh({"dp": dp})
ex = ShardedExecutor(qg, mesh)
x = data[0]

def _sync(o):
    # multi-process global arrays: only local shards are addressable;
    # fetching one (on CPU) is a true sync
    jax.block_until_ready(o)
    np.asarray(o.addressable_shards[0].data if hasattr(o, "addressable_shards")
               and o.addressable_shards else o)

_sync(ex.run_device(x)[-1])  # compile + warm

t0 = time.perf_counter()
best = float("inf")
for _ in range(3):
    t = time.perf_counter()
    for _ in range(steps):
        outs = ex.run_device(x)
    _sync(outs[-1])
    best = min(best, (time.perf_counter() - t) / steps)
step_time = best

em = ShardedTraceEmitter(qg, mesh)
import io
if is_coordinator():
    buf = io.BytesIO()
    man = em.emit(x, buf)          # warm
    t = time.perf_counter()
    buf = io.BytesIO()
    man = em.emit(x, buf)
    trace_time = time.perf_counter() - t
    records = man["records"]
else:
    em.emit(x, None)
    t = time.perf_counter()
    em.emit(x, None)
    trace_time = time.perf_counter() - t
    records = 0

if pid == 0:
    with open(out_path, "w") as f:
        json.dump({"step_time": step_time, "batch": batch,
                   "trace_time": trace_time, "records": records,
                   "devices_per_proc": n_dev}, f)
    print("WORKER0 done", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def run_group(nproc: int, mode: str, steps: int, base_batch: int,
              devices_per_proc: int = 2) -> dict:
    port = _free_port()
    out = tempfile.mktemp(suffix=".json")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), str(nproc), str(port),
             mode, str(steps), out, str(base_batch)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(nproc)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout.decode())
        if p.returncode != 0:
            raise RuntimeError(
                f"worker failed (nproc={nproc}):\n" + logs[-1][-3000:])
    with open(out) as f:
        r = json.load(f)
    os.unlink(out)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--batch", type=int, default=8,
                    help="per-process batch (weak) / global batch (strong)")
    ap.add_argument("--devices-per-proc", type=int, default=2)
    args = ap.parse_args()
    procs = [int(p) for p in args.procs.split(",")]

    weak, strong = {}, {}
    for n in procs:
        weak[n] = run_group(n, "weak", args.steps, args.batch,
                            args.devices_per_proc)
        print(f"weak n={n}: step {weak[n]['step_time']*1e3:.2f} ms "
              f"batch {weak[n]['batch']}", file=sys.stderr, flush=True)
        strong[n] = run_group(n, "strong", args.steps,
                              args.batch * max(procs),
                              args.devices_per_proc)
        print(f"strong n={n}: step {strong[n]['step_time']*1e3:.2f} ms",
              file=sys.stderr, flush=True)

    base = procs[0]
    result = {
        "metric": "scaling_efficiency",
        "procs": procs,
        "devices_per_proc": args.devices_per_proc,
        "weak_step_ms": {n: round(weak[n]["step_time"] * 1e3, 3)
                         for n in procs},
        "strong_step_ms": {n: round(strong[n]["step_time"] * 1e3, 3)
                           for n in procs},
        "weak_efficiency": {
            n: round(weak[base]["step_time"] / weak[n]["step_time"], 3)
            for n in procs},
        "strong_efficiency": {
            n: round(strong[base]["step_time"]
                     / (n // base * strong[n]["step_time"]), 3)
            for n in procs},
        "trace_records": weak[procs[-1]]["records"],
        "traces_per_sec": {
            n: round(weak[n]["records"] / weak[n]["trace_time"], 2)
            if weak[n]["trace_time"] else 0.0 for n in procs},
        "methodology": "cpu-mesh correctness harness; hardware fills in "
                       "ICI/DCN numbers (see module docstring)",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
