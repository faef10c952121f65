"""Tune bm/bn for the ResNet-50 residual-block STACK geometries (b8) and
commit the best configs to the served DB (tune/tophub_v5e.jsonl).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_tune_stacks.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from tachikoma_tpu.tune.database import TuneDatabase  # noqa: E402
from tachikoma_tpu.tune.tuner import NO_ERROR, TuneRecord, conv_stack_task  # noqa: E402

DB = os.path.join(os.path.dirname(__file__), "..", "tachikoma_tpu",
                  "tune", "tophub_v5e.jsonl")


def bottleneck(cin, mid, nblocks):
    return [[(1, cin, mid), (3, mid, mid), (1, mid, cin)]] * nblocks


def main():
    import jax

    print("device", jax.devices()[0], flush=True)
    db = TuneDatabase(DB)
    geos = [(8, 56, bottleneck(256, 64, 2)),
            (8, 28, bottleneck(512, 128, 3)),
            (8, 14, bottleneck(1024, 256, 5)),
            (8, 7, bottleneck(2048, 512, 2)),
            # b32 sub-batch geometries (chain_batch_split runs nb<=8 at 56
            # and 28; record the full-batch keys too so lookups hit)
            (32, 14, bottleneck(1024, 256, 5)),
            (32, 7, bottleneck(2048, 512, 2))]
    for n, hw, bdims in geos:
        workload, configs, measure, meta_fn, _w = conv_stack_task(
            n, hw, hw, bdims, bms=(256, 512, 1024), bn_caps=(128, 256))
        print(f"== {workload}", flush=True)
        for cfg in configs:
            t, err, msg = measure(cfg)
            rec = TuneRecord(
                workload, cfg,
                t * 1e3 if t != float("inf") else float("inf"), err, msg,
                meta=meta_fn(t) if err == NO_ERROR else {})
            db.add(rec)
            status = (f"{t*1e6:.1f} us ({rec.meta.get('tops', 0)} TOPS)"
                      if err == NO_ERROR else f"err{err}: {msg[:80]}")
            print(f"  {cfg}: {status}", flush=True)
        best = db.best(workload)
        print(f"  BEST: {best.config if best else None} "
              f"{best.latency_ms if best else ''} ms", flush=True)


if __name__ == "__main__":
    main()
