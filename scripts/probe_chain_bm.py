"""Chain block sweep: extend the frame-chain tuning to bm=2048 and cover
the bench chain geometry (depth-3/6 3x3 c128), with output verification.

Every candidate is verified bit-exactly against the certified per-stage
qconv2d_flat path before its time is recorded (measurement-safety rule:
an unrunnable grid writes garbage at launch speed and poisons the DB).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_chain_bm.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

PEAK_TOPS = 394.7


def main():
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import (chain_workload,
                                                    qconv2d_flat,
                                                    qconv2d_flat_chain)
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.tune.database import (NO_ERROR, TuneDatabase,
                                             TuneRecord)
    from tachikoma_tpu.utils.timing import per_iter_chain

    import jax
    print("device:", jax.devices()[0].device_kind, flush=True)

    db = TuneDatabase("tachikoma_tpu/tune/tophub_v5e.jsonl")
    have = {(r.workload, r.config.get("bm"), r.config.get("bn"))
            for r in db.records if r.error_no == NO_ERROR}

    rng = np.random.default_rng(0)
    m, s = plan_requantize(0.0004, 0.05)

    # (n, h, w, stage_dims) — bench chains first, then ResNet bottlenecks
    geoms = [
        (8, 56, 56, [(3, 128, 128)] * 3),
        (8, 56, 56, [(3, 128, 128)] * 6),
        (8, 56, 56, [(1, 64, 64), (3, 64, 64), (1, 64, 256)]),
        (8, 56, 56, [(1, 256, 64), (3, 64, 64), (1, 64, 256)]),
        (8, 28, 28, [(1, 512, 128), (3, 128, 128), (1, 128, 512)]),
        (8, 14, 14, [(1, 1024, 256), (3, 256, 256), (1, 256, 1024)]),
        (8, 7, 7, [(1, 2048, 512), (3, 512, 512), (1, 512, 2048)]),
    ]
    for (n, h, w, dims) in geoms:
        wl = chain_workload(n, h, w, dims)
        stages = []
        for (kh, ci, co) in dims:
            pad = kh // 2
            stages.append(dict(
                w=rng.integers(-127, 127, (kh, kh, ci, co)).astype(np.int8),
                bias=rng.integers(-500, 500, (co,)).astype(np.int32),
                multiplier=m, shift=s, izp=0, out_zp=0,
                padding=(pad, pad, pad, pad)))
        x = jnp.asarray(rng.integers(-127, 127,
                                     (n, h, w, dims[0][1])).astype(np.int8))
        macs = sum(n * h * w * co * kh * kh * ci for (kh, ci, co) in dims)

        # certified reference: per-stage wrapper path
        cur = x
        for st in stages:
            cur = qconv2d_flat(cur, st["w"], bias=st["bias"],
                               multiplier=st["multiplier"], shift=st["shift"],
                               padding=st["padding"])
        ref = np.asarray(cur)

        for bm in (512, 1024, 2048):
            for bn_cap in (128, 256):
                if (wl, bm, bn_cap) in have:
                    print(f"{wl} bm={bm} bn={bn_cap}: have", flush=True)
                    continue

                def fn(a, _bm=bm, _bn=bn_cap):
                    return qconv2d_flat_chain(a, stages, bm=_bm, bn_cap=_bn)

                def feedback(a, out):
                    return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0])

                try:
                    got = np.asarray(fn(x))
                    if not np.array_equal(got, ref):
                        print(f"{wl} bm={bm} bn={bn_cap}: WRONG RESULT "
                              f"(not recorded)", flush=True)
                        continue
                    t = per_iter_chain(fn, x, feedback, repeats=2)
                except Exception as e:
                    print(f"{wl} bm={bm} bn={bn_cap}: FAIL "
                          f"{type(e).__name__}: {str(e)[:100]}", flush=True)
                    continue
                tp = 2 * macs / t / 1e12
                if tp > PEAK_TOPS:
                    print(f"{wl} bm={bm} bn={bn_cap}: IMPOSSIBLE {tp:.1f} "
                          f"TOPS (not recorded)", flush=True)
                    continue
                db.add(TuneRecord(wl, {"bm": bm, "bn": bn_cap}, t * 1e3,
                                  NO_ERROR, "", meta={"tops": round(tp, 2)}))
                print(f"{wl} bm={bm} bn={bn_cap}: {t*1e6:.1f} us = "
                      f"{tp:.1f} TOPS ({100*tp/PEAK_TOPS:.1f}%) "
                      f"[{t*1e6/len(dims):.1f} us/conv]", flush=True)

    for (n, h, w, dims) in geoms:
        wl = chain_workload(n, h, w, dims)
        r = db.best(wl)
        if r:
            print(f"BEST {wl}: {r.config} {r.time_ms*1e3:.1f} us "
                  f"{r.meta.get('tops', '?')} TOPS", flush=True)


if __name__ == "__main__":
    main()
