"""Measure frame-chained conv throughput on v5e: a 3-deep 3x3 chain at the
headline geometry vs 3 sequential standalone ops — per-conv time in the
chain is the graph-resident number (entry pad + exit slice amortize)."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

PEAK_TOPS = 394.7


def main():
    import jax
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import (qconv2d_flat,
                                                    qconv2d_flat_chain)
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.utils.timing import per_iter_chain

    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    n, h, w, c = 8, 56, 56, 128
    depth = 3
    m, s = plan_requantize(0.0004, 0.05)
    stages = [dict(w=rng.integers(-127, 127, (3, 3, c, c)).astype(np.int8),
                   bias=rng.integers(-500, 500, (c,)).astype(np.int32),
                   multiplier=m, shift=s, izp=0, out_zp=0,
                   padding=(1, 1, 1, 1)) for _ in range(depth)]
    x = rng.integers(-127, 127, (n, h, w, c)).astype(np.int8)
    macs1 = n * h * w * c * 9 * c

    def run_chain(a, bm=512):
        return qconv2d_flat_chain(a, stages, bm=bm)

    def run_seq(a):
        cur = a
        for st in stages:
            cur = qconv2d_flat(cur, st["w"], bias=st["bias"],
                               multiplier=st["multiplier"], shift=st["shift"],
                               strides=(1, 1), padding=st["padding"])
        return cur

    # exactness on-chip first
    oc = np.asarray(jax.jit(run_chain)(jnp.asarray(x)))
    osq = np.asarray(jax.jit(run_seq)(jnp.asarray(x)))
    print("on-chip chain vs sequential:",
          "EXACT" if (oc == osq).all() else "MISMATCH!!!", flush=True)

    def feedback(a, out):
        return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0])

    for name, fn in (("chain bm512 ", run_chain),
                     ("chain bm1024", lambda a: run_chain(a, 1024)),
                     ("sequential  ", run_seq)):
        try:
            per = per_iter_chain(fn, jnp.asarray(x), feedback)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            continue
        per_conv = per / depth
        tops = 2 * macs1 / per_conv / 1e12
        print(f"{name}: total {per*1e6:7.1f}us  per-conv {per_conv*1e6:6.1f}us"
              f"  {tops:6.1f}TOPS ({tops/PEAK_TOPS:4.0%} roofline)",
              flush=True)


if __name__ == "__main__":
    main()
