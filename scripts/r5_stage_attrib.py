"""Per-stage attribution inside block stacks (round 5): where do the
small-spatial stacks' cycles go?  s2 (28^2 C512/mid128) measured ~34
useful TOPS and s4 (7^2 C2048/mid512) ~24-29 — far from any static SoL
estimate; attribute by DEPTH DIFFERENTIALS (the honest in-context method,
runtime/profiler.py style): time stacks of increasing stage count at the
same geometry; the marginal cost of stage k is t(k) - t(k-1), entry/exit
cancel in differences.

Writes /tmp/r5/stage_attrib.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = "/tmp/r5/stage_attrib.json"
os.makedirs("/tmp/r5", exist_ok=True)
res = {}


def save():
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)


def mkstage(rng, kh, cin, cout):
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize

    m, s = plan_requantize(0.03, 0.04)
    pad = kh // 2
    return dict(w=rng.integers(-127, 127, (kh, kh, cin, cout)).astype(np.int8),
                bias=rng.integers(-500, 500, (cout,)).astype(np.int32),
                multiplier=m, shift=s, izp=0, out_zp=0,
                padding=(pad, pad, pad, pad))


def main():
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat_block_stack
    from tachikoma_tpu.utils.timing import median_iqr, per_iter_chain_samples

    import jax

    print("device", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    geos = [("s4", 8, 7, 2048, 512),
            ("s2", 8, 28, 512, 128),
            ("s1", 8, 56, 256, 64)]
    for name, n, hw, cin, mid in geos:
        st1 = mkstage(rng, 1, cin, mid)
        st2 = mkstage(rng, 3, mid, mid)
        st3 = mkstage(rng, 1, mid, cin)
        # prefixes: wrap each prefix as a single residual-free block; the
        # LAST prefix is the full block plus a second identical block
        variants = {
            "d1": [([st1], None)],
            "d2": [([st1, st2], None)],
            "d3": [([st1, st2, st3], None)],
            "d6": [([st1, st2, st3], None), ([st1, st2, st3], None)],
        }
        x = jnp.asarray(rng.integers(-127, 127,
                                     (n, hw, hw, cin)).astype(np.int8))

        def feedback(a, out):
            o = out.astype(jnp.int8)
            co = o.shape[-1]
            reps = a.shape[-1] // co
            tiled = jnp.tile(o, (1, 1, 1, reps)) if reps > 1 else \
                o[..., :a.shape[-1]]
            return a ^ (tiled[:, :a.shape[1], :a.shape[2], :a.shape[3]] & 1)

        row = {}
        for tag, blocks in variants.items():
            try:
                t0 = time.time()
                _ = np.asarray(qconv2d_flat_block_stack(x, blocks))
                xs = per_iter_chain_samples(
                    lambda a, b=blocks: qconv2d_flat_block_stack(a, b),
                    x, feedback, samples=5)
                med, iqr = median_iqr(xs)
                macs = sum(n * hw * hw * st["w"].shape[3]
                           * st["w"].shape[0] * st["w"].shape[1]
                           * st["w"].shape[2]
                           for (sts, _) in blocks for st in sts)
                row[tag] = {"us": round(med * 1e6, 1),
                            "iqr_us": round(iqr * 1e6, 1),
                            "tops": round(2 * macs / med / 1e12, 1),
                            "compile_s": round(time.time() - t0, 1)}
                print(f"{name} {tag}: {row[tag]}", flush=True)
            except Exception as e:  # noqa: BLE001
                row[tag] = {"error": repr(e)[:200]}
                print(f"{name} {tag}: ERROR {row[tag]}", flush=True)
        # marginals
        try:
            row["marginal_us"] = {
                "stage1_1x1_in": row["d1"]["us"],
                "stage2_3x3": round(row["d2"]["us"] - row["d1"]["us"], 1),
                "stage3_1x1_out": round(row["d3"]["us"] - row["d2"]["us"],
                                        1),
                "whole_extra_block": round(row["d6"]["us"] - row["d3"]["us"],
                                           1),
            }
        except Exception:
            pass
        res[name] = row
        save()
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
