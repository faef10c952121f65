"""Adjudicate XLA-native int8 convs with FULL-OUTPUT feedback (round 5).

r4_stride2.py read the XLA native int8 stride-2 conv at 319 TOPS (81%)
under a SCALAR feedback — the protocol round 3 flagged as invalid for XLA
candidates (narrowing).  This probe re-measures every XLA candidate with a
full-output xor feedback (no narrowing possible), output-verified:

  * s2 3x3 56->28 C128->256 conv (raw int32 accumulator)
  * the same + exact XLA-side requantize (fixed_point fast path) e2e
  * stride-1 3x3 8x56x56 C128 (the headline shape) raw + requantized
  * depthwise 3x3 on the worst MobileNetV2 stages (the bytes-roofline
    ledger showed the VPU path 23x OFF its physics floor)

Writes /tmp/r5/xla_conv.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = "/tmp/r5/xla_conv.json"
os.makedirs("/tmp/r5", exist_ok=True)
res = {}


def save():
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tachikoma_tpu.ops.fixed_point import requantize_jnp
    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.utils.timing import median_iqr, per_iter_chain_samples

    print("device", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    m, s = plan_requantize(0.0004, 0.05)
    m, s = int(m), int(s)

    def timeit(tag, fn, x, verify_against, macs):
        try:
            got = np.asarray(fn(x))
            ok = (got == verify_against).all() if verify_against is not None \
                else True
            if not ok:
                res[tag] = {"error": "MISMATCH",
                            "maxdiff": int(np.abs(
                                got.astype(np.int64)
                                - verify_against.astype(np.int64)).max())}
                print(tag, res[tag], flush=True)
                save()
                return

            def fb(a, out):
                o = (out & 1).astype(jnp.int8)
                # fold the FULL output back into a (shape-mismatch safe):
                # reduce out over trailing dims to a scalar per batch is
                # NOT full dependence; instead xor a slice-matched tile
                oh, ow, oc = o.shape[1], o.shape[2], o.shape[3]
                ah, aw, ac = a.shape[1], a.shape[2], a.shape[3]
                reps = (1, -(-ah // oh), -(-aw // ow), -(-ac // oc))
                t = jnp.tile(o, reps)[:, :ah, :aw, :ac]
                return a ^ t

            xs = per_iter_chain_samples(fn, x, fb, samples=5)
            med, iqr = median_iqr(xs)
            res[tag] = {"us": round(med * 1e6, 2),
                        "iqr_us": round(iqr * 1e6, 2),
                        "tops": round(2 * macs / med / 1e12, 1),
                        "frac": round(2 * macs / med / 394.7e12, 4)}
            print(tag, res[tag], flush=True)
        except Exception as e:  # noqa: BLE001
            res[tag] = {"error": repr(e)[:250]}
            print(tag, res[tag], flush=True)
        save()

    # ---- stride-2 3x3 ----
    n, h, w, cin, cout, k = 8, 56, 56, 128, 256, 3
    oh = ow = 28
    x = rng.integers(-127, 128, (n, h, w, cin)).astype(np.int8)
    wt = rng.integers(-127, 128, (k, k, cin, cout)).astype(np.int8)
    xj = jnp.asarray(x)
    wj = jnp.asarray(wt)
    macs2 = n * oh * ow * cout * k * k * cin

    ref_q = np.asarray(qconv2d_flat(xj, wt, multiplier=m, shift=s,
                                    strides=(2, 2), padding=(1, 1, 1, 1)))

    raw = jax.jit(lambda a: lax.conv_general_dilated(
        a, wj, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32))
    acc_ref = np.asarray(raw(xj))
    timeit("s2_xla_raw_fullfb", raw, xj, acc_ref, macs2)

    def s2_rq(a):
        acc = lax.conv_general_dilated(
            a, wj, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        from tachikoma_tpu.ops.fixed_point import q_multiply_shift_jnp

        v = q_multiply_shift_jnp(acc, m, s, "UPWARD")
        return jnp.clip(v, -128, 127).astype(jnp.int8)

    s2_rq_j = jax.jit(s2_rq)
    timeit("s2_xla_rq_fullfb", s2_rq_j, xj, ref_q, macs2)

    # ---- stride-1 3x3 headline ----
    cout1 = 128
    wt1 = rng.integers(-127, 128, (3, 3, 128, cout1)).astype(np.int8)
    w1j = jnp.asarray(wt1)
    macs1 = n * h * w * cout1 * 9 * cin
    ref1 = np.asarray(qconv2d_flat(xj, wt1, multiplier=m, shift=s,
                                   strides=(1, 1), padding=(1, 1, 1, 1)))
    raw1 = jax.jit(lambda a: lax.conv_general_dilated(
        a, w1j, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32))
    acc1 = np.asarray(raw1(xj))
    timeit("s1_xla_raw_fullfb", raw1, xj, acc1, macs1)

    def s1_rq(a):
        acc = lax.conv_general_dilated(
            a, w1j, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        from tachikoma_tpu.ops.fixed_point import q_multiply_shift_jnp

        v = q_multiply_shift_jnp(acc, m, s, "UPWARD")
        return jnp.clip(v, -128, 127).astype(jnp.int8)

    timeit("s1_xla_rq_fullfb", jax.jit(s1_rq), xj, ref1, macs1)

    # the Pallas kernel anchor under the SAME protocol
    def pall(a):
        return qconv2d_flat(a, wt1, multiplier=m, shift=s,
                            strides=(1, 1), padding=(1, 1, 1, 1))
    timeit("s1_pallas_anchor", pall, xj, ref1, macs1)

    # ---- depthwise: worst MBv2 stages ----
    for (hh, c, stride) in ((112, 96, 2), (56, 144, 1), (28, 192, 1),
                            (14, 576, 1)):
        ohh = hh // stride
        xd = rng.integers(-127, 128, (8, hh, hh, c)).astype(np.int8)
        wd = rng.integers(-127, 128, (3, 3, 1, c)).astype(np.int8)
        xdj = jnp.asarray(xd)
        wdj = jnp.asarray(wd)
        macsd = 8 * ohh * ohh * c * 9
        refd = np.asarray(qconv2d_flat(
            xdj, wd, multiplier=m, shift=s, strides=(stride, stride),
            padding=(1, 1, 1, 1), groups=c))

        rawd = jax.jit(lambda a, wdj=wdj, stride=stride, c=c:
                       lax.conv_general_dilated(
                           a, wdj, (stride, stride), ((1, 1), (1, 1)),
                           dimension_numbers=("NHWC", "HWIO", "NHWC"),
                           feature_group_count=c,
                           preferred_element_type=jnp.int32))
        accd = np.asarray(rawd(xdj))
        timeit(f"dw{hh}s{stride}c{c}_xla_raw", rawd, xdj, accd, macsd)

        def dw_rq(a, wdj=wdj, stride=stride, c=c):
            acc = lax.conv_general_dilated(
                a, wdj, (stride, stride), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
                preferred_element_type=jnp.int32)
            from tachikoma_tpu.ops.fixed_point import q_multiply_shift_jnp

            v = q_multiply_shift_jnp(acc, m, s, "UPWARD")
            return jnp.clip(v, -128, 127).astype(jnp.int8)

        timeit(f"dw{hh}s{stride}c{c}_xla_rq", jax.jit(dw_rq), xdj, refd,
               macsd)

        def dw_pall(a, wd=wd, stride=stride, c=c):
            return qconv2d_flat(a, wd, multiplier=m, shift=s,
                                strides=(stride, stride),
                                padding=(1, 1, 1, 1), groups=c)
        timeit(f"dw{hh}s{stride}c{c}_pallas_anchor", dw_pall, xdj, refd,
               macsd)

    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
