"""Tune bm/bn for the ResNet-50 residual-block STACK geometries (b8) and
commit the best configs to the served DB (tune/tophub_v5e.jsonl).

Wedge-resistant (round-3/4 tunnel lessons): each config is measured in its
OWN subprocess under a hard timeout — a wedged remote compile loses one
trial, not the run — with a cooldown after every timeout and completed
trials checkpointed in the DB (reruns skip them).  Geometries run
smallest-first so the DB fills even if the big 56^2 compiles wedge.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_tune_stacks.py
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

DB = os.path.join(os.path.dirname(__file__), "..", "tachikoma_tpu",
                  "tune", "tophub_v5e.jsonl")
TRIAL_TIMEOUT = int(os.environ.get("TK_TRIAL_TIMEOUT", "900"))
COOLDOWN = 150

WORKER = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from tachikoma_tpu.tune.tuner import conv_stack_task
spec = json.loads(sys.argv[1])
workload, configs, measure, meta_fn, _w = conv_stack_task(
    spec["n"], spec["hw"], spec["hw"], spec["bdims"],
    bms=(spec["cfg"]["bm"],), bn_caps=(spec["cfg"]["bn"],))
t, err, msg = measure(spec["cfg"])
print("TRIAL_RESULT " + json.dumps(
    {"t": t if t != float("inf") else None, "err": err, "msg": msg[-400:],
     "meta": meta_fn(t) if err == 0 else {}}), flush=True)
"""


def bottleneck(cin, mid, nblocks):
    return [[(1, cin, mid), (3, mid, mid), (1, mid, cin)]] * nblocks


def main():
    from tachikoma_tpu.ops.pallas.conv_flat import stack_workload
    from tachikoma_tpu.tune.database import TuneDatabase
    from tachikoma_tpu.tune.tuner import (COMPILE_ERROR, NO_ERROR,
                                          TuneRecord)

    db = TuneDatabase(DB)
    # smallest-first
    geos = [(8, 7, bottleneck(2048, 512, 2)),
            (8, 14, bottleneck(1024, 256, 5)),
            (32, 7, bottleneck(2048, 512, 2)),
            (32, 14, bottleneck(1024, 256, 5)),
            (8, 28, bottleneck(512, 128, 3)),
            (8, 56, bottleneck(256, 64, 2))]
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tk_jaxcache")
    for n, hw, bdims in geos:
        workload = stack_workload(n, hw, hw, bdims)
        done = {json.dumps(r.config, sort_keys=True)
                for r in db.records if r.workload == workload
                and r.error_no == NO_ERROR}
        print(f"== {workload}", flush=True)
        for bm in (256, 512, 1024):
            for bn in (128, 256):
                cfg = {"bm": bm, "bn": bn}
                if json.dumps(cfg, sort_keys=True) in done:
                    print(f"  {cfg}: already in DB, skip", flush=True)
                    continue
                spec = json.dumps({"n": n, "hw": hw, "bdims": bdims,
                                   "cfg": cfg})
                try:
                    r = subprocess.run(
                        [sys.executable, "-c", WORKER, spec], env=env,
                        capture_output=True, text=True,
                        timeout=TRIAL_TIMEOUT)
                    line = next((ln for ln in r.stdout.splitlines()
                                 if ln.startswith("TRIAL_RESULT ")), None)
                    if line is None:
                        raise RuntimeError(
                            f"no result (rc={r.returncode}): "
                            + (r.stderr or "")[-300:])
                    d = json.loads(line[len("TRIAL_RESULT "):])
                    t = d["t"] if d["t"] is not None else float("inf")
                    rec = TuneRecord(workload, cfg,
                                     t * 1e3 if t != float("inf")
                                     else float("inf"),
                                     d["err"], d["msg"], meta=d["meta"])
                    db.add(rec)
                    status = (f"{t*1e6:.1f} us "
                              f"({d['meta'].get('tops', 0)} TOPS)"
                              if d["err"] == NO_ERROR
                              else f"err{d['err']}: {d['msg'][:80]}")
                    print(f"  {cfg}: {status}", flush=True)
                except subprocess.TimeoutExpired:
                    db.add(TuneRecord(workload, cfg, float("inf"),
                                      COMPILE_ERROR,
                                      f"trial timeout {TRIAL_TIMEOUT}s "
                                      "(tunnel wedge)", meta={}))
                    print(f"  {cfg}: TIMEOUT {TRIAL_TIMEOUT}s — cooldown "
                          f"{COOLDOWN}s", flush=True)
                    time.sleep(COOLDOWN)
                except Exception as e:  # noqa: BLE001
                    print(f"  {cfg}: FAILED {e!r}", flush=True)
        best = db.best(workload)
        print(f"  BEST: {best.config if best else None} "
              f"{best.time_ms if best else ''} ms", flush=True)


if __name__ == "__main__":
    main()
