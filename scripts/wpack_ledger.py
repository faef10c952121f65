"""Loss ledger for the (packed) stage1 bottleneck chain: where do ~85 us
of a 105 us chain go when the MXU dots are ~16 us?

Chain-depth differentials at a SHARED frame geometry (every variant
includes the 3x3 stage, so max_kw — and hence wph/hp/fh — are identical;
entry pad and exit extraction are common to all, and stage adds fall out
of the differences):

  c_s2    = entry + 3x3(64->64) + exit
  c_s12   = entry + 1x1(64->64) + 3x3 + exit           (s1 add = c_s12-c_s2)
  c_s123  = entry + 1x1 + 3x3 + 1x1(64->256) + exit    (s3 add = c_s123-c_s12)
  c_s1    = entry + 1x1(64->64) + exit  (own, smaller geometry: kw=1)
  lone    = qconv2d_flat on the 3x3 (wrapper path, for context)

  timeout 1500 python -u scripts/wpack_ledger.py > /tmp/wpack_ledger.json 2>/tmp/wpack_ledger.err
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402

from tachikoma_tpu.ops.pallas.conv_flat import (qconv2d_flat,  # noqa: E402
                                                qconv2d_flat_chain)
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


s1, s2, s3 = mkstage(1, 64, 64), mkstage(3, 64, 64), mkstage(1, 64, 256)
x = jnp.asarray(rng.integers(-127, 127, (n, h, w, 64)).astype(np.int8))

fns = {
    "c_s2": lambda a: qconv2d_flat_chain(a, [s2]),
    "c_s12": lambda a: qconv2d_flat_chain(a, [s1, s2]),
    "c_s123": lambda a: qconv2d_flat_chain(a, [s1, s2, s3]),
    "c_s1": lambda a: qconv2d_flat_chain(a, [s1]),
    "lone_3x3": lambda a: qconv2d_flat(
        a, s2["w"], bias=s2["bias"], multiplier=m, shift=s,
        strides=(1, 1), padding=(1, 1, 1, 1)),
}


def feedback(a, out):
    return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0])


samp = per_iter_chain_samples_multi(fns, x, feedback, samples=5)
res = {}
for name, xs in samp.items():
    per, iqr = median_iqr(xs)
    res[name] = {"us": round(per * 1e6, 2), "iqr_us": round(iqr * 1e6, 2)}
# per-sample differentials (drift-cancelling, same protocol as bench chain)
d_s1 = [b - a for a, b in zip(samp["c_s2"], samp["c_s12"])]
d_s3 = [b - a for a, b in zip(samp["c_s12"], samp["c_s123"])]
res["s1_add_us"] = round(median_iqr(d_s1)[0] * 1e6, 2)
res["s3_add_us"] = round(median_iqr(d_s3)[0] * 1e6, 2)
print(json.dumps(res), flush=True)
