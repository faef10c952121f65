"""Depthwise bytes-roofline ledger (round-5 verdict item 10).

MobileNetV2 sits at ~0.5% MFU "by design (VPU-bound)" — this ledger PROVES
it per depthwise stage: a depthwise conv moves ~(in + out + weights) bytes
and performs kh*kw MACs per input element, so its arithmetic intensity is
~9 MACs/byte at int8 — far below the ~250 MACs/byte the MXU roofline
needs; the binding resource is HBM bandwidth (plus VPU issue rate).  For
each MobileNetV2 depthwise stage we compute the bytes-moved lower bound,
the HBM-roofline time at the v5e's measured effective bandwidth, and the
MEASURED kernel time — attributing the "0.5% MFU" to physics per stage.

Reference analog: topi/nn/depthwise_conv2d.py + ARM spatial-pack schedules
(same physics, different device).  Writes /tmp/r5/depthwise_ledger.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = "/tmp/r5/depthwise_ledger.json"
os.makedirs("/tmp/r5", exist_ok=True)

# MobileNetV2 b8 224^2 depthwise stages: (h_in, c, stride)
STAGES = [
    (112, 32, 1), (112, 96, 2), (56, 144, 1), (56, 144, 2),
    (28, 192, 1), (28, 192, 1), (28, 192, 2), (14, 384, 1),
    (14, 384, 1), (14, 384, 1), (14, 576, 1), (14, 576, 1),
    (14, 576, 2), (7, 960, 1), (7, 960, 1),
]
N = 8
HBM_GBPS = 760.0   # measured effective (RESULTS.md pad probe ~713-800)
VPU_GOPS = 3900.0  # v5e VPU int32 lane ops/s order of magnitude


def main():
    import jax.numpy as jnp

    import jax

    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.utils.timing import median_iqr, per_iter_chain_samples

    print("device", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    m, s = plan_requantize(0.03, 0.04)
    rows = []
    for h, c, stride in STAGES:
        oh = h // stride
        x = rng.integers(-127, 127, (N, h, h, c)).astype(np.int8)
        w = rng.integers(-127, 127, (3, 3, 1, c)).astype(np.int8)
        xd = jnp.asarray(x)

        def fn(a, w=w, stride=stride):
            return qconv2d_flat(a, w, multiplier=m, shift=s,
                                strides=(stride, stride),
                                padding=(1, 1, 1, 1), groups=w.shape[3])

        def feedback(a, out):
            o = out & 1
            return a.at[:, :o.shape[1], :o.shape[2], :].set(
                a[:, :o.shape[1], :o.shape[2], :] ^ o)

        t0 = time.time()
        _ = np.asarray(fn(xd))
        xs = per_iter_chain_samples(fn, xd, feedback, samples=5)
        med, iqr = median_iqr(xs)

        macs = N * oh * oh * c * 9
        bytes_min = N * h * h * c + N * oh * oh * c + 9 * c
        t_hbm = bytes_min / (HBM_GBPS * 1e9)
        t_vpu = macs / (VPU_GOPS * 1e9)
        sol = max(t_hbm, t_vpu)
        rows.append({
            "stage": f"{h}x{h}s{stride}c{c}", "measured_us":
            round(med * 1e6, 1), "iqr_us": round(iqr * 1e6, 2),
            "bytes_min_MB": round(bytes_min / 1e6, 2),
            "hbm_floor_us": round(t_hbm * 1e6, 1),
            "vpu_floor_us": round(t_vpu * 1e6, 1),
            "sol_us": round(sol * 1e6, 1),
            "sol_frac": round(sol / med, 3),
            "useful_tops": round(2 * macs / med / 1e12, 2),
            "mfu_pct": round(2 * macs / med / 394.7e12 * 100, 2),
        })
        print(rows[-1], flush=True)
        with open(OUT, "w") as f:
            json.dump({"N": N, "hbm_gbps": HBM_GBPS,
                       "vpu_gops": VPU_GOPS, "stages": rows}, f, indent=1)
    tot_meas = sum(r["measured_us"] for r in rows)
    tot_sol = sum(r["sol_us"] for r in rows)
    print(f"TOTAL measured {tot_meas:.0f} us vs physics floor "
          f"{tot_sol:.0f} us -> {tot_sol/tot_meas:.2f} of roofline",
          flush=True)
    with open(OUT, "w") as f:
        json.dump({"N": N, "hbm_gbps": HBM_GBPS, "vpu_gops": VPU_GOPS,
                   "stages": rows,
                   "total_measured_us": round(tot_meas, 1),
                   "total_sol_us": round(tot_sol, 1),
                   "roofline_share": round(tot_sol / tot_meas, 3)},
                  f, indent=1)


if __name__ == "__main__":
    main()
