"""Deep-chain probe: pin the chain-INTERIOR per-conv time.

Entry pad + exit extraction are fixed costs; per-conv time at depth d is
t_conv + OH/d.  Measuring d in {3, 6, 9, 12} fits both terms; the interior
differential (t_d2 - t_d1) / (d2 - d1) cancels OH exactly — the honest
graph-resident conv number (cut-point ablation at the kernel level).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_chain_deep.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

PEAK_TOPS = 394.7


def main():
    import jax
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import (chain_workload,
                                                    qconv2d_flat,
                                                    qconv2d_flat_chain)
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.tune.database import (NO_ERROR, TuneDatabase,
                                             TuneRecord)
    from tachikoma_tpu.utils.timing import per_iter_chain

    print("device:", jax.devices()[0].device_kind, flush=True)
    db = TuneDatabase("tachikoma_tpu/tune/tophub_v5e.jsonl")

    n, h, w, c = 8, 56, 56, 128
    rng = np.random.default_rng(0)
    m, s = plan_requantize(0.0004, 0.05)
    macs1 = n * h * w * c * 9 * c

    totals = {}
    for depth in (3, 6, 9, 12):
        stages = [dict(w=rng.integers(-127, 127, (3, 3, c, c)).astype(np.int8),
                       bias=rng.integers(-500, 500, (c,)).astype(np.int32),
                       multiplier=m, shift=s, izp=0, out_zp=0,
                       padding=(1, 1, 1, 1)) for _ in range(depth)]
        x = jnp.asarray(rng.integers(-127, 127, (n, h, w, c)).astype(np.int8))
        cur = x
        for st in stages:
            cur = qconv2d_flat(cur, st["w"], bias=st["bias"],
                               multiplier=st["multiplier"], shift=st["shift"],
                               padding=st["padding"])
        ref = np.asarray(cur)
        for bm in (512, 1024):
            def fn(a, _bm=bm):
                return qconv2d_flat_chain(a, stages, bm=_bm, bn_cap=128)

            def feedback(a, out):
                return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0])

            try:
                got = np.asarray(fn(x))
                if not np.array_equal(got, ref):
                    print(f"d={depth} bm={bm}: WRONG RESULT", flush=True)
                    continue
                t = per_iter_chain(fn, x, feedback, repeats=3)
            except Exception as e:
                print(f"d={depth} bm={bm}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                continue
            totals[(depth, bm)] = t
            tp = 2 * macs1 * depth / t / 1e12
            dims = [(3, c, c)] * depth
            db.add(TuneRecord(chain_workload(n, h, w, dims),
                              {"bm": bm, "bn": 128}, t * 1e3, NO_ERROR, "",
                              meta={"tops": round(tp, 2)}))
            print(f"d={depth} bm={bm}: {t*1e6:.1f} us total, "
                  f"{t*1e6/depth:.1f} us/conv = {tp:.1f} TOPS "
                  f"({100*tp/PEAK_TOPS:.1f}%)", flush=True)

    # interior differentials
    for bm in (512, 1024):
        for d1, d2 in ((3, 6), (6, 9), (6, 12), (3, 12)):
            if (d1, bm) in totals and (d2, bm) in totals:
                ti = (totals[(d2, bm)] - totals[(d1, bm)]) / (d2 - d1)
                tp = 2 * macs1 / ti / 1e12
                print(f"INTERIOR bm={bm} d{d1}->d{d2}: {ti*1e6:.2f} us/conv "
                      f"= {tp:.1f} TOPS ({100*tp/PEAK_TOPS:.1f}%)",
                      flush=True)


if __name__ == "__main__":
    main()
