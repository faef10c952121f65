"""On-chip A/B: width-packed vs unpacked ResNet-50 stage1 bottleneck chain.

8x56x56, stages K1C64O64 + K3C64O64 + K1C64O256 — the shape class the
round-4 MFU ledger pinned at 15-25 useful TOPS because C64 pads to the
128-lane MXU granularity.  Packing halves padded MACs (conv_flat
_chain_wpack2_eligible); this probe verifies outputs match on-chip and
times both variants interleaved (measurement-safety + drift discipline
per CLAUDE.md).

Run ALONE (one TPU process), under timeout, output to a file:
  timeout 1200 python -u scripts/wpack_probe.py > /tmp/wpack_probe.json 2>/tmp/wpack_probe.err
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

# measurement safety: outputs must MATCH before any timing is recorded
print("verify outputs ...", file=sys.stderr, flush=True)
op = np.asarray(qconv2d_flat_chain(x, stages))
ou = np.asarray(qconv2d_flat_chain(x, stages, wpack=False))
assert op.shape == ou.shape == (n, h, w, 256), (op.shape, ou.shape)
assert (op == ou).all(), f"MISMATCH max={np.abs(op.astype(int)-ou.astype(int)).max()}"
print("outputs bit-identical; timing ...", file=sys.stderr, flush=True)

fns = {
    "packed": lambda a: qconv2d_flat_chain(a, stages),
    "unpacked": lambda a: qconv2d_flat_chain(a, stages, wpack=False),
}


def feedback(a, out):
    return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0])


samp = per_iter_chain_samples_multi(fns, x, feedback, samples=5)
macs = n * h * w * (64 * 64 + 9 * 64 * 64 + 64 * 256)
res = {}
for name, xs in samp.items():
    per, iqr = median_iqr(xs)
    res[name] = {"us": round(per * 1e6, 2), "iqr_us": round(iqr * 1e6, 2),
                 "useful_tops": round(2 * macs / per / 1e12, 2)}
res["speedup"] = round(res["unpacked"]["us"] / res["packed"]["us"], 3)
print(json.dumps(res), flush=True)
