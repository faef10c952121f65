"""Third stack sweep: small bm (128/256) at bn=512 for the small-spatial
geometries — after bn=512 retired the x re-streaming, the remaining waste
at H7/H14 is the bm-granular lead block + grid round-up (useful rows 392
vs computed 1536 at H7/bm512)."""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

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
    from tachikoma_tpu.tune.tuner import COMPILE_ERROR, NO_ERROR, TuneRecord

    db = TuneDatabase("/root/repo/tachikoma_tpu/tune/tophub_v5e.jsonl")
    geos = [(8, 7, bottleneck(2048, 512, 2)),
            (8, 14, bottleneck(1024, 256, 5)),
            (32, 7, bottleneck(2048, 512, 2)),
            (32, 14, bottleneck(1024, 256, 5))]
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tk_jaxcache")
    for n, hw, bdims in geos:
        workload = stack_workload(n, hw, hw, bdims)
        print(f"== {workload}", flush=True)
        for bm in (128, 256):
            cfg = {"bm": bm, "bn": 512}
            spec = json.dumps({"n": n, "hw": hw, "bdims": bdims,
                               "cfg": cfg})
            try:
                r = subprocess.run([sys.executable, "-c", WORKER, spec],
                                   env=env, capture_output=True, text=True,
                                   timeout=900)
                line = next((ln for ln in r.stdout.splitlines()
                             if ln.startswith("TRIAL_RESULT ")), None)
                if line is None:
                    raise RuntimeError(f"no result rc={r.returncode}: "
                                       + (r.stderr or "")[-300:])
                d = json.loads(line[len("TRIAL_RESULT "):])
                t = d["t"] if d["t"] is not None else float("inf")
                db.add(TuneRecord(workload, cfg,
                                  t * 1e3 if t != float("inf")
                                  else float("inf"),
                                  d["err"], d["msg"], meta=d["meta"]))
                status = (f"{t*1e6:.1f} us ({d['meta'].get('tops', 0)} "
                          "TOPS)" if d["err"] == NO_ERROR
                          else f"err{d['err']}: {d['msg'][:80]}")
                print(f"  {cfg}: {status}", flush=True)
            except subprocess.TimeoutExpired:
                db.add(TuneRecord(workload, cfg, float("inf"),
                                  COMPILE_ERROR, "trial timeout", meta={}))
                print(f"  {cfg}: TIMEOUT — cooldown", flush=True)
                time.sleep(150)
            except Exception as e:  # noqa: BLE001
                print(f"  {cfg}: FAILED {e!r}", flush=True)
        best = db.best(workload)
        print(f"  BEST: {best.config if best else None} "
              f"{best.time_ms if best else ''} ms", flush=True)


if __name__ == "__main__":
    main()
