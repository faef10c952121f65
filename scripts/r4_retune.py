"""Round-4 budget-scheduled retune of ResNet-50's workload set on-chip.

The clamped requantize epilogue changed every fused kernel's cost surface,
so the round-3 tune DB picks are stale.  This runs the cross-workload
budget scheduler (tune/schedule.py, the auto_scheduler TaskScheduler
analog) over the full quantized+fused ResNet-50 b8 task set under a fixed
trial budget, appending to the served DB — both the round-4 retune and the
scheduler's hardware validation.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_retune.py [budget]
"""

import json
import os
import sys


def main():
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tk_jaxcache")
    import numpy as np

    from tachikoma_tpu.models.vision import resnet
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.runtime.fuse import fuse_qnn
    from tachikoma_tpu.tune.database import TOPHUB_PATH, TuneDatabase
    from tachikoma_tpu.tune.schedule import graph_tasks, schedule_tune

    print("building + quantizing ResNet-50 b8 (oracle calibration)...",
          flush=True)
    g = resnet(50, batch_size=8, image_size=224)
    rng = np.random.default_rng(0)
    qg = quantize(g, [rng.standard_normal((8, 224, 224, 3)).astype(np.float32)])
    fg = fuse_qnn(qg)
    tasks = graph_tasks(fg)
    print(f"{len(tasks)} tasks:", flush=True)
    for t in tasks:
        print(f"  w={t.weight:2d} x{len(t.configs):3d} cfgs  {t.workload}",
              flush=True)
    db = TuneDatabase(TOPHUB_PATH)
    print(f"db: {len(db)} records before", flush=True)
    rep = schedule_tune(tasks, db, total_trials=budget, verbose=True)
    print(json.dumps(rep, indent=1), flush=True)
    print(f"db: {len(db)} records after", flush=True)


if __name__ == "__main__":
    main()
