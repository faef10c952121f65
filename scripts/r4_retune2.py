"""Round-4 targeted retune of the BENCH headline workloads not covered by
the ResNet-50 scheduled retune: the depth-chain geometry at (8,56,56,128)
3x3, the headline single conv, and the stride-2 stage-boundary shape —
their DB records predate the clamped epilogue.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_retune2.py
"""

import os


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tk_jaxcache")
    from tachikoma_tpu.tune.database import TOPHUB_PATH, TuneDatabase
    from tachikoma_tpu.tune.tuner import (tune_conv_chain, tune_conv_flat,
                                          tune_matmul)

    db = TuneDatabase(TOPHUB_PATH)
    print(f"db: {len(db)} records before", flush=True)
    # headline single conv (bench conv/conv_kernel geometry)
    tune_conv_flat((8, 56, 56, 128), (3, 3, 128, 128), (1, 1),
                   (1, 1, 1, 1), 1, db, strategy="model")
    # headline stride-2 stage boundary (bench + VERDICT item 7 geometry)
    tune_conv_flat((8, 56, 56, 128), (3, 3, 128, 256), (2, 2),
                   (1, 1, 1, 1), 1, db, strategy="model")
    # bench chain geometry (6 x 3x3 C128)
    tune_conv_chain(8, 56, 56, [(3, 128, 128)] * 6, db,
                    bms=(512, 1024, 2048), bn_caps=(128,))
    tune_conv_chain(8, 56, 56, [(3, 128, 128)] * 3, db,
                    bms=(512, 1024, 2048), bn_caps=(128,))
    # headline matmul (bench 4096^3)
    tune_matmul(4096, 4096, 4096, db, fused=True, strategy="model")
    # BERT dense shapes (epilogue change shifts optima)
    for (M, K, N) in [(512, 768, 768), (512, 768, 3072), (512, 3072, 768)]:
        tune_matmul(M, K, N, db, fused=True, strategy="model")
    print(f"db: {len(db)} records after", flush=True)
    for w in db.workloads():
        b = db.best(w)
        if b and any(t in w for t in ("H56", "4096", "768", "3072")):
            print(f"  best {w}: {b.config} {b.time_ms*1e3:.1f} us "
                  f"{b.meta.get('tops', '')} TOPS", flush=True)


if __name__ == "__main__":
    main()
