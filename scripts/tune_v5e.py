"""Tune the Pallas kernels on the v5e and write the packaged tophub DB.

Shapes: the hot workloads of the BASELINE models (ResNet-50 b8, MobileNetV2
b8, BERT-base b4 s128, ViT-L).  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/tune_v5e.py [out.jsonl]

Compile time over the tunnel dominates (~2 compiles per candidate), so the
candidate grids are deliberately small; the persistent jax compile cache
makes re-runs cheap.
"""
import sys

from tachikoma_tpu.tune.database import TOPHUB_PATH, TuneDatabase
from tachikoma_tpu.tune.tuner import (tune_conv_chain, tune_conv_flat,
                                      tune_matmul)

OUT = sys.argv[1] if len(sys.argv) > 1 else TOPHUB_PATH

# (M, K, N) fused matmuls: ResNet-50 1x1 convs (b8), BERT-base (b4 s128),
# ViT-L (b1 s197 -> padded 224/16=14^2+1).
MATMULS = [
    (25088, 64, 256), (25088, 256, 64), (25088, 64, 64),
    (6272, 512, 128), (6272, 128, 512), (6272, 256, 512),
    (1568, 1024, 256), (1568, 256, 1024), (1568, 512, 1024),
    (392, 2048, 512), (392, 512, 2048), (392, 1024, 2048),
    (512, 768, 768), (512, 768, 3072), (512, 3072, 768),
    (788, 1024, 1024), (788, 1024, 4096), (788, 4096, 1024),
    # ResNet-50 b8 stem: 7x7 s2 via im2col (flat M = 8 * 115 * 116, K = 16
    # phase-taps x 12 phase-channels, N = 64)
    (106720, 192, 64),
]

MM_CANDS = [(256, 256, 512), (256, 512, 512), (512, 256, 512),
            (512, 512, 512), (512, 512, 1024), (512, 128, 1024),
            (128, 512, 1024), (1024, 256, 256), (256, 1024, 256)]

# conv3x3 layers (b8): ResNet-50 bottleneck 3x3s + stage-entry stride-2.
CONVS = [
    ((8, 56, 56, 64), (3, 3, 64, 64), (1, 1)),
    ((8, 56, 56, 128), (3, 3, 128, 128), (1, 1)),     # bench headline
    ((8, 28, 28, 128), (3, 3, 128, 128), (1, 1)),
    ((8, 14, 14, 256), (3, 3, 256, 256), (1, 1)),
    ((8, 7, 7, 512), (3, 3, 512, 512), (1, 1)),
    ((8, 56, 56, 128), (3, 3, 128, 128), (2, 2)),
    ((8, 28, 28, 256), (3, 3, 256, 256), (2, 2)),
    ((8, 14, 14, 512), (3, 3, 512, 512), (2, 2)),
]


# ResNet-50 b8 bottleneck chain geometries (fuse_conv_chains output)
CHAINS = [
    (8, 56, 56, [(1, 64, 64), (3, 64, 64), (1, 64, 256)]),
    (8, 56, 56, [(1, 256, 64), (3, 64, 64), (1, 64, 256)]),
    (8, 28, 28, [(1, 512, 128), (3, 128, 128), (1, 128, 512)]),
    (8, 14, 14, [(1, 1024, 256), (3, 256, 256), (1, 256, 1024)]),
    (8, 7, 7, [(1, 2048, 512), (3, 512, 512), (1, 512, 2048)]),
]


def main():
    import jax

    import os
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/tk_jaxcache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], flush=True)

    db = TuneDatabase(OUT)
    done = set(db.workloads())

    from tachikoma_tpu.tune.tuner import matmul_workload

    for (m, k, n) in MATMULS:
        if matmul_workload(m, k, n, True) in done:
            print(f"skip M{m}_K{k}_N{n} (done)", flush=True)
            continue
        # clip to padded dims, never below the int8 tile minimums
        # (a 64-lane K block wedges the Mosaic compile)
        ru = lambda v, mlt: -(-v // mlt) * mlt
        cands = sorted({(min(bm, ru(m, 32)), min(bn, ru(n, 128)), min(bk, ru(k, 128)))
                        for (bm, bn, bk) in MM_CANDS})
        tune_matmul(m, k, n, db, fused=True, candidates=cands)

    from tachikoma_tpu.ops.pallas.conv_flat import flat_conv_workload

    for (shape, wshape, strides) in CONVS:
        k = wshape[0]
        pad = (k // 2,) * 4
        wl = flat_conv_workload(shape[0], shape[1], shape[2], shape[3],
                                wshape[3], k, k, strides, True, 1)
        if wl in done:
            print(f"skip {wl} (done)", flush=True)
            continue
        tune_conv_flat(shape, wshape, strides, pad, 1, db)

    print(f"\n{len(db)} records -> {OUT}")
    from tachikoma_tpu.ops.pallas.conv_flat import chain_workload

    for (n, h, w, dims) in CHAINS:
        if chain_workload(n, h, w, dims) in done:
            continue
        tune_conv_chain(n, h, w, dims, db)

    for wl in db.workloads():
        r = db.best(wl)
        if r:
            print(f"  {wl}: {r.config} {r.time_ms*1e3:.1f} us "
                  f"{r.meta.get('tops', '?')} TOPS")


if __name__ == "__main__":
    main()
