"""Block sweep for the width-packed stage1 chain geometry (one process,
interleaved variants, output-verified before timing).  Prints one JSON line
per variant; the winner goes into tune/tophub_v5e.jsonl as the served
record for the packed workload key.

  timeout 1500 python -u scripts/wpack_sweep.py > /tmp/wpack_sweep.json 2>/tmp/wpack_sweep.err
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402

from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat_chain  # noqa: E402
from tachikoma_tpu.ops.pallas.qms32 import plan_requantize  # noqa: E402
from tachikoma_tpu.utils.timing import (median_iqr,  # noqa: E402
                                        per_iter_chain_samples_multi)

n, h, w = 8, 56, 56
rng = np.random.default_rng(0)
m, s = plan_requantize(0.0004, 0.05)


def mkstage(k, ci, co):
    pad = k // 2
    return dict(w=rng.integers(-127, 127, (k, k, ci, co)).astype(np.int8),
                bias=rng.integers(-500, 500, (co,)).astype(np.int32),
                multiplier=m, shift=s, izp=0, out_zp=0,
                padding=(pad, pad, pad, pad))


stages = [mkstage(1, 64, 64), mkstage(3, 64, 64), mkstage(1, 64, 256)]
x = jnp.asarray(rng.integers(-127, 127, (n, h, w, 64)).astype(np.int8))

ref = np.asarray(qconv2d_flat_chain(x, stages, wpack=False))

CONFIGS = [(256, 128), (512, 128), (512, 256), (1024, 128), (1024, 256),
           (2048, 256)]
fns = {"unpacked": lambda a: qconv2d_flat_chain(a, stages, wpack=False)}
for bm_, bn_ in CONFIGS:
    # measurement safety: verify each variant's output vs the certified path
    got = np.asarray(qconv2d_flat_chain(x, stages, bm=bm_, bn_cap=bn_))
    if not (got == ref).all():
        print(json.dumps({"bm": bm_, "bn": bn_, "error": "MISMATCH"}),
              flush=True)
        continue
    fns[f"p{bm_}x{bn_}"] = (lambda a, b=bm_, c=bn_:
                            qconv2d_flat_chain(a, stages, bm=b, bn_cap=c))
print("verified; timing ...", file=sys.stderr, flush=True)


def feedback(a, out):
    return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0])


samp = per_iter_chain_samples_multi(fns, x, feedback, samples=5)
macs = n * h * w * (64 * 64 + 9 * 64 * 64 + 64 * 256)
out = {}
for name, xs in samp.items():
    per, iqr = median_iqr(xs)
    out[name] = {"us": round(per * 1e6, 2), "iqr_us": round(iqr * 1e6, 2),
                 "useful_tops": round(2 * macs / per / 1e12, 2)}
print(json.dumps(out), flush=True)
