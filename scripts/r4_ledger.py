"""Round-4 conv loss ledger (v5e): measured attribution of the gap between
the headline conv (8x56x56x128 3x3, 42.8% wrapper / ~51% kernel in round 3)
and the >=90% BASELINE target, plus the K-depth hypothesis probes.

Hypothesis under test: the conv kernel's ~51% ceiling is the MXU's int8
K=128 rate (approx the bf16 rate) — each 3x3 tap is a K=128 dot, while the
91.7%-roofline matmul runs K>=512-deep blocks.  The mm_* probes below
replicate the conv's exact M/N geometry and sweep ONLY the K-block
structure: 9 accumulated K=128 steps (tap-equivalent) vs 3x384 vs 1x1152.

Every conv variant's OUTPUT is verified against the certified default
kernel before its time is recorded (round-3 measurement-safety rule).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_ledger.py

Writes incremental JSON to $R4_OUT (default /tmp/r4/ledger.json).
"""

import json
import os

import numpy as np

V5E_INT8_TOPS = 394.7
OUT = os.environ.get("R4_OUT", "/tmp/r4/ledger.json")

results = {}


def rec(name, samples, macs=None):
    from tachikoma_tpu.utils.timing import median_iqr

    med, iqr = median_iqr(samples)
    d = {"med_us": round(med * 1e6, 2), "iqr_us": round(iqr * 1e6, 2)}
    if macs:
        d["tops"] = round(2 * macs / med / 1e12, 1)
        d["frac"] = round(d["tops"] / V5E_INT8_TOPS, 4)
    results[name] = d
    print(name, json.dumps(d), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def fail(name, e):
    results[name] = {"error": repr(e)[:200]}
    print(name, "FAILED:", repr(e)[:200], flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tachikoma_tpu.ops.pallas.conv_flat import (_build_flat_conv,
                                                    _flat_lengths, _round_up,
                                                    qconv2d_flat)
    from tachikoma_tpu.ops.pallas.matmul_int8 import (_build_qmatmul,
                                                      _x32_tracing)
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.utils.timing import per_iter_chain_samples

    print("devices:", jax.devices(), flush=True)

    n, h, w, cin, cout, k = 8, 56, 56, 128, 128, 3
    rng = np.random.default_rng(0)
    x4 = rng.integers(-127, 127, (n, h, w, cin)).astype(np.int8)
    wt = rng.integers(-127, 127, (k, k, cin, cout)).astype(np.int8)
    mult, shift = plan_requantize(0.0004, 0.05)
    conv_macs = n * h * w * cout * k * k * cin

    xj = jnp.asarray(x4)
    ref = np.asarray(qconv2d_flat(xj, wt, multiplier=mult, shift=shift,
                                  strides=(1, 1), padding=(1, 1, 1, 1)))

    def fb4(a, out):
        return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0])

    def fb2(a, out):
        return a.at[0, 0].add(out[0, 0].astype(jnp.int8))

    # ---------------- matmul K-structure probes ----------------
    # M matches the conv grid exactly (28672 rows at bm=4096); N = cout_p.
    M, N = 28672, 128

    def mm_probe(name, K, bk, bm, bn=128):
        A = jnp.asarray(rng.integers(-127, 127, (M, K)).astype(np.int8))
        B = rng.integers(-127, 127, (K, N)).astype(np.int8)
        raw = _build_qmatmul(M, K, N, bm, bn, bk, 0, "UPWARD", -128, 127,
                             "int32", False, False)

        def fn(a):
            with _x32_tracing():
                return raw(a, B)

        try:
            rec(name, per_iter_chain_samples(fn, A, fb2, samples=5),
                macs=M * K * N)
        except Exception as e:  # noqa: BLE001
            fail(name, e)

    mm_probe("mm_tap_k128", 128, 128, 4096)            # one tap's dot
    mm_probe("mm_k1152_bk128_bm4096", 1152, 128, 4096)  # 9 tap-like k-steps
    mm_probe("mm_k1152_bk384_bm4096", 1152, 384, 4096)  # 3 k-steps
    mm_probe("mm_k1152_bk1152_bm2048", 1152, 1152, 2048)  # single deep dot
    mm_probe("mm_k1152_bk1152_bm1024", 1152, 1152, 1024)
    mm_probe("mm_k1152_bk576_bm2048", 1152, 576, 2048)
    # N-width effect at fixed deep K (the 91.7% matmul ran N-blocks of 512)
    mm_probe("mm_m4096_k4096_n128_bk1024", 4096, 1024, 512, 128)
    mm_probe("mm_m4096_k4096_n512_bk1024", 4096, 1024, 512, 512)

    # ---------------- conv kernel variants (verified) ----------------
    pad = k // 2
    hph, wph = h + 2 * pad, _round_up(w + 2 * pad, 4)
    cin_p, cout_p = _round_up(cin, 128), _round_up(cout, 128)

    def conv_wrapper_probe(name, blocks, layout):
        def fn(a):
            return qconv2d_flat(a, wt, multiplier=mult, shift=shift,
                                strides=(1, 1), padding=(1, 1, 1, 1),
                                blocks=blocks, layout=layout)

        try:
            got = np.asarray(fn(xj))
            if not np.array_equal(got, ref):
                fail(name, ValueError("OUTPUT MISMATCH vs certified kernel"))
                return
            rec(name, per_iter_chain_samples(fn, xj, fb4, samples=5),
                macs=conv_macs)
        except Exception as e:  # noqa: BLE001
            fail(name, e)

    conv_wrapper_probe("conv_wrap_default", None, None)
    conv_wrapper_probe("conv_wrap_s_bm1024", (1024, 128, 128), "s")
    conv_wrapper_probe("conv_wrap_s_bm2048", (2048, 128, 128), "s")
    conv_wrapper_probe("conv_wrap_s_bm4096", (4096, 128, 128), "s")
    conv_wrapper_probe("conv_wrap_w_bm2048", (2048, 128, 128), "w")
    conv_wrapper_probe("conv_wrap_base_bm2048", (2048, 128, 128), None)

    # raw kernel on its required layout (flat padded image built once)
    def kernel_probe(name, bm, layout):
        fh, mp, fhx = _flat_lengths(n, hph, wph, k, k, bm)
        xpad = np.zeros((n, hph, wph, cin), np.int8)
        xpad[:, pad:pad + h, pad:pad + w, :] = x4
        xf = np.zeros((fhx, cin_p), np.int8)
        xf[: n * fh, :cin] = xpad.reshape(n * fh, cin)
        wfull = np.zeros((k, k, cin_p, cout_p), np.int8)
        wfull[:, :, :cin, :cout] = wt
        m1 = np.broadcast_to(np.int32(mult), (1, cout_p))
        s1 = np.broadcast_to(np.int32(shift), (1, cout_p))
        b1 = np.zeros((1, cout_p), np.int32)
        kern = _build_flat_conv(mp, fhx, cin_p, cout_p, k, k, wph, bm,
                                128, 128, True, 0, "UPWARD", -128, 127,
                                "int8", (int(shift),), False, layout)

        def fn(a):
            with _x32_tracing():
                return kern(a, wfull, b1, m1, s1)

        try:
            out = np.asarray(fn(jnp.asarray(xf)))
            got = out[: n * fh].reshape(n, hph, wph, cout_p)[:, :h, :w, :cout]
            if not np.array_equal(got, ref):
                fail(name, ValueError("OUTPUT MISMATCH vs certified kernel"))
                return
            rec(name, per_iter_chain_samples(fn, jnp.asarray(xf), fb2,
                                             samples=5), macs=conv_macs)
        except Exception as e:  # noqa: BLE001
            fail(name, e)

    kernel_probe("conv_kernel_base_bm4096", 4096, None)
    kernel_probe("conv_kernel_base_bm1024", 1024, None)
    kernel_probe("conv_kernel_s_bm1024", 1024, "s")
    kernel_probe("conv_kernel_s_bm2048", 2048, "s")

    # ---------------- wrapper component costs ----------------
    # optimization_barrier forces full materialization of the XLA-side
    # pad/flatten and extraction passes so they cannot be narrowed away by
    # the single-element feedback.
    fh, mp, fhx = _flat_lengths(n, hph, wph, k, k, 4096)

    def pad_flatten(a):
        xp = jnp.pad(a, ((0, 0), (pad, hph - h - pad),
                         (pad, wph - w - pad), (0, 0)))
        xf = xp.reshape(n * fh, cin)
        xf = jnp.pad(xf, ((0, fhx - n * fh), (0, cin_p - cin)))
        return lax.optimization_barrier(xf)

    def fb_pad(a, out):
        return a.at[0, 0, 0, 0].add(out[0, 0].astype(jnp.int8))

    try:
        rec("wrap_pad_flatten",
            per_iter_chain_samples(pad_flatten, xj, fb_pad, samples=5))
    except Exception as e:  # noqa: BLE001
        fail("wrap_pad_flatten", e)

    out_flat = jnp.asarray(
        rng.integers(-127, 127, (mp, cout_p)).astype(np.int8))

    def extract(o):
        imgs = [lax.slice(o, (i * fh, 0), (i * fh + h * wph, cout_p))
                for i in range(n)]
        out4 = jnp.stack(imgs).reshape(n, h, wph, cout_p)
        return lax.optimization_barrier(out4[:, :, :w, :cout])

    def fb_ex(a, out):
        return a.at[0, 0].add(out[0, 0, 0, 0])

    try:
        rec("wrap_extract",
            per_iter_chain_samples(extract, out_flat, fb_ex, samples=5))
    except Exception as e:  # noqa: BLE001
        fail("wrap_extract", e)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
