"""Stem attack round 2 (r5 late): s2d(2) + 16 UNIT-STRIDE slice im2col +
the tuned Pallas int8 matmul.

The earlier probe (r5_stem_probe.py) showed every conv-emitter route
(XLA f32/bf16/int8, s2d+XLA-int8, polyphase flat) pays a ~0.8-1.6 ms
BATCH-INDEPENDENT fixed cost inside the conv lowering.  This route never
calls a conv emitter at all:

  1. pad (3,3) -> (N,230,230,3), space-to-depth(2) -> y (N,115,115,12)
     (reshape+transpose, exact relabeling);
  2. im2col for the equivalent 4x4 s1 conv = concat of 16 unit-stride
     slices y[:, u:u+112, v:v+112, :] -> (N,112,112,192); the reshape to
     (M,192) is free (minor dims contiguous).  No strided slices anywhere
     (the r4 pathology).
  3. (M,192) @ (192,64) int8 via qmatmul_int8 with the exact clamped
     requantize epilogue — scattered weights wscat[(u*4+v)*12+(p*2+q)*3+c]
     = w[2u+p, 2v+q, c] (zeros where 2u+p >= 7).

Exact by construction; output bit-compared against the certified
qconv2d_flat anchor before timing.  Writes /tmp/r5/stem_im2col.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = "/tmp/r5/stem_im2col.json"
os.makedirs("/tmp/r5", exist_ok=True)
res = {}


def save():
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)


def main():
    import jax
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat
    from tachikoma_tpu.ops.pallas.matmul_int8 import qmatmul_int8
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.utils.timing import median_iqr, per_iter_chain_samples

    print("device", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    # production-realistic conv ratio (s_in*s_w/s_out ~ 0.008, shift -4..-8
    # band -> clamp-eligible epilogue; see CLAUDE.md round-5 lessons)
    m, s = plan_requantize(0.0004, 0.05)
    m, s = int(m), int(s)

    cin, cout, k, st, pad = 3, 64, 7, 2, 3

    # scattered 4x4x12 weights (u-major, v, then phase-major channel)
    def scatter_w(wt):
        w8 = np.zeros((8, 8, cin, cout), np.int8)
        w8[:7, :7] = wt
        wsc = np.zeros((16 * 4 * cin, cout), np.int8)
        for u in range(4):
            for v in range(4):
                for p in range(2):
                    for q in range(2):
                        base = (u * 4 + v) * 12 + (p * 2 + q) * cin
                        wsc[base:base + cin] = w8[2 * u + p, 2 * v + q]
        return wsc

    for n in (8, 32):
        h, oh = 224, 112
        x = rng.integers(-127, 128, (n, h, h, cin)).astype(np.int8)
        wt = rng.integers(-127, 128, (k, k, cin, cout)).astype(np.int8)
        xj = jnp.asarray(x)
        macs = n * oh * oh * cout * k * k * cin

        def anchor(a):
            return qconv2d_flat(a, wt, multiplier=m, shift=s,
                                strides=(st, st),
                                padding=(pad, pad, pad, pad))

        ref = np.asarray(anchor(xj))
        wsc = scatter_w(wt)

        def fb(a, out):
            t = (out & 1).astype(jnp.int32).sum(axis=-1).astype(jnp.int8)
            return a.at[:, :t.shape[1], :t.shape[2], 0].add(t)

        def timeit(tag, fn, x_in):
            try:
                got = np.asarray(fn(x_in))
                if not (got == ref).all():
                    res[f"{tag}_b{n}"] = {
                        "error": "MISMATCH",
                        "maxdiff": int(np.abs(
                            got.astype(np.int64)
                            - ref.astype(np.int64)).max())}
                    print(tag, n, res[f"{tag}_b{n}"], flush=True)
                    save()
                    return
                xs = per_iter_chain_samples(fn, x_in, fb, samples=5)
                med, iqr = median_iqr(xs)
                res[f"{tag}_b{n}"] = {
                    "us": round(med * 1e6, 1),
                    "iqr_us": round(iqr * 1e6, 1),
                    "tops": round(2 * macs / med / 1e12, 1)}
                print(tag, n, res[f"{tag}_b{n}"], flush=True)
            except Exception as e:  # noqa: BLE001
                res[f"{tag}_b{n}"] = {"error": repr(e)[:250]}
                print(tag, n, res[f"{tag}_b{n}"], flush=True)
            save()

        def make_im2col(blocks):
            def f(a):
                ap = jnp.pad(a, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
                nn = ap.shape[0]
                y = ap.reshape(nn, 115, 2, 115, 2, cin)
                y = y.transpose(0, 1, 3, 2, 4, 5).reshape(nn, 115, 115,
                                                          4 * cin)
                pat = jnp.concatenate(
                    [y[:, u:u + oh, v:v + oh, :]
                     for u in range(4) for v in range(4)], axis=-1)
                flat = pat.reshape(nn * oh * oh, 16 * 4 * cin)
                out = qmatmul_int8(flat, wsc, multiplier=m, shift=s,
                                   blocks=blocks)
                return out.reshape(nn, oh, oh, cout)
            return jax.jit(f)

        timeit("stem_im2col_tuned", make_im2col(None), xj)
        timeit("stem_im2col_b512_128_192", make_im2col((512, 128, 192)), xj)
        timeit("stem_im2col_b1024_128_256", make_im2col((1024, 128, 256)),
               xj)
        # anchor timing last (known ~0.4-1.2 ms band)
        try:
            xs = per_iter_chain_samples(anchor, xj, fb, samples=3)
            med, iqr = median_iqr(xs)
            res[f"anchor_f32_b{n}"] = {"us": round(med * 1e6, 1),
                                       "iqr_us": round(iqr * 1e6, 1)}
            print("anchor", n, res[f"anchor_f32_b{n}"], flush=True)
        except Exception as e:  # noqa: BLE001
            res[f"anchor_f32_b{n}"] = {"error": repr(e)[:250]}
        save()

    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
