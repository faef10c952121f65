"""ResNet stem attack (round 5): the exact-f32 route measures 0.40 ms at
b8 and ~3.7 ms at b32 (ablation) — ~20-45x off SoL and now the biggest
single e2e residual.  Candidates (all bit-verified against the certified
kernel before timing):

  stem_f32_current    — the shipped exact-f32 XLA route (anchor)
  stem_xla_int8       — XLA native int8 conv, cin=3 (XLA's own tiny-cin
                        handling) + exact requantize
  stem_s2d_xla_int8   — space-to-depth(2): (N,224,224,3)->(N,112,112,12);
                        the 7x7 s2 conv becomes an EXACT 4x4 s1 conv over
                        12 channels (tap (a,b) of phase (p,q) =
                        w[2a+p, 2b+q]); then XLA int8 conv + requantize

Writes /tmp/r5/stem_probe.json.  Shapes: b8 and b32 at 224^2.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = "/tmp/r5/stem_probe.json"
os.makedirs("/tmp/r5", exist_ok=True)
res = {}


def save():
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat
    from tachikoma_tpu.ops.pallas.qms32 import (plan_requantize,
                                                q_multiply_shift_u32)
    from tachikoma_tpu.utils.timing import median_iqr, per_iter_chain_samples

    print("device", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    m, s = plan_requantize(0.0004, 0.05)
    m, s = int(m), int(s)

    for n in (8, 32):
        h = 224
        oh = 112
        cin, cout, k, st, pad = 3, 64, 7, 2, 3
        x = rng.integers(-127, 128, (n, h, h, cin)).astype(np.int8)
        wt = rng.integers(-127, 128, (k, k, cin, cout)).astype(np.int8)
        xj = jnp.asarray(x)
        macs = n * oh * oh * cout * k * k * cin

        def anchor(a):
            return qconv2d_flat(a, wt, multiplier=m, shift=s,
                                strides=(st, st),
                                padding=(pad, pad, pad, pad))
        ref = np.asarray(anchor(xj))

        def fb(a, out):
            # FULL dependence at tiny cost: every output element feeds the
            # channel-sum; XLA cannot narrow the conv through it.  (The
            # first version tiled the whole output to a's 224^2 shape — a
            # 6.6M-element op that dominated timing and crashed the remote
            # compiler.)
            t = (out & 1).astype(jnp.int32).sum(axis=-1).astype(jnp.int8)
            return a.at[:, :t.shape[1], :t.shape[2], 0].add(t)

        def timeit(tag, fn, x_in, verify=True):
            try:
                if verify:
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

        timeit("stem_f32_current", anchor, xj, verify=False)

        # XLA int8 direct
        wj = jnp.asarray(wt)

        def xla_direct(a):
            ap = jnp.pad(a, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            acc = lax.conv_general_dilated(
                ap, wj, (st, st), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            v = q_multiply_shift_u32(acc, m, s, "UPWARD")
            return jnp.clip(v, -128, 127).astype(jnp.int8)

        timeit("stem_xla_int8", jax.jit(xla_direct), xj)

        # space-to-depth(2): padded (228 -> 228) even dims; packed channels
        # c*(p,q): exact relabeling of the stride-2 grid.  4x4 kernel:
        # tap (a2, b2) phase (p, q) = w[2*a2 + p, 2*b2 + q] (7 -> pad to 8).
        w8 = np.zeros((8, 8, cin, cout), np.int8)
        w8[:7, :7] = wt
        ws2d = np.zeros((4, 4, 4 * cin, cout), np.int8)
        for p in range(2):
            for q in range(2):
                for a2 in range(4):
                    for b2 in range(4):
                        ws2d[a2, b2, (p * 2 + q) * cin:(p * 2 + q + 1) * cin] \
                            = w8[2 * a2 + p, 2 * b2 + q]
        ws2dj = jnp.asarray(ws2d)

        def s2d(a):
            # pad to 232 (even): rows 2y+a reach 2*111+7 = 229 < 231; the
            # extra zero rows are never read by kept outputs
            ap = jnp.pad(a, ((0, 0), (pad, 5), (pad, 5), (0, 0)))
            nn, hh = ap.shape[0], ap.shape[1]
            g = ap.reshape(nn, hh // 2, 2, hh // 2, 2, cin)
            g = g.transpose(0, 1, 3, 2, 4, 5).reshape(
                nn, hh // 2, hh // 2, 4 * cin)
            acc = lax.conv_general_dilated(
                g, ws2dj, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)[:, :oh, :oh]
            v = q_multiply_shift_u32(acc, m, s, "UPWARD")
            return jnp.clip(v, -128, 127).astype(jnp.int8)

        timeit("stem_s2d_xla_int8", jax.jit(s2d), xj)

    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
