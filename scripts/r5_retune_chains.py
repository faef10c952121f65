"""Post-geometry-change chain retune: the minimal-hp tail-pad frame
geometry (conv_flat.chain_frame_geometry) changed every chain workload's
cost surface, so the DB's chain records (timed on the inflated-hp frames)
are stale.  Re-measure the bench chain geometries and the small-spatial
shapes where the new bm=256 candidate can win.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_retune_chains.py
"""

import os


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tk_jaxcache")
    from tachikoma_tpu.tune.database import TOPHUB_PATH, TuneDatabase
    from tachikoma_tpu.tune.tuner import tune_conv_chain

    db = TuneDatabase(TOPHUB_PATH)
    print(f"db: {len(db)} records before", flush=True)
    # bench chain geometry, both depths (the d6-d3 differential)
    tune_conv_chain(8, 56, 56, [(3, 128, 128)] * 6, db,
                    bms=(512, 1024, 2048), bn_caps=(128,))
    tune_conv_chain(8, 56, 56, [(3, 128, 128)] * 3, db,
                    bms=(512, 1024, 2048), bn_caps=(128,))
    # small-spatial chains: bm=256 vs 512 is the open question there
    tune_conv_chain(8, 14, 14, [(3, 256, 256)] * 3, db,
                    bms=(256, 512), bn_caps=(128, 256))
    tune_conv_chain(8, 28, 28, [(3, 128, 128)] * 3, db,
                    bms=(256, 512, 1024), bn_caps=(128,))
    print(f"db: {len(db)} records after", flush=True)
    for w in db.workloads():
        if "chain" in w:
            b = db.best(w)
            if b:
                print(f"  best {w}: {b.config} {b.time_ms*1e3:.1f} us "
                      f"{b.meta.get('tops', 0)} TOPS", flush=True)


if __name__ == "__main__":
    main()
