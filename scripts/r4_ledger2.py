"""Round-4 ledger, pass 2: clean re-measurement with the small-sync timing
protocol (pass 1's full-array syncs pulled up to 33 MB per sample through
the ~29 MB/s tunnel; its variance invalidated the matmul structure probes).

Measures, all at the headline conv geometry's M (28672 rows, N=128):
  * MXU K-structure rates: total K=1152 as 9x128 / 3x384 / 1x1152 k-blocks,
    plus the single-tap K=128 — quantifies what tap depth the MXU rewards.
  * base conv kernel (bm 1024/4096) — the certified reference point.
  * R row-stacked conv kernel (K=3x384, operand pre-stacked in HBM) and the
    stack-inside-jit end-to-end form.
  * wrapper total / pad / extract components.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_ledger2.py
"""

import json
import os

import numpy as np

V5E_INT8_TOPS = 394.7
OUT = os.environ.get("R4_OUT", "/tmp/r4/ledger2.json")
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
                                                    _flat_lengths,
                                                    _phase_weights,
                                                    _round_up, qconv2d_flat)
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
    shift_values = (int(shift),)
    conv_macs = n * h * w * cout * k * k * cin

    xj = jnp.asarray(x4)
    ref = np.asarray(qconv2d_flat(xj, wt, multiplier=mult, shift=shift,
                                  strides=(1, 1), padding=(1, 1, 1, 1)))

    def fb2(a, out):
        return a.at[0, 0].add(out[0, 0].astype(jnp.int8))

    # ---------------- matmul K-structure (clean) ----------------
    M, N = 28672, 128

    def mm_probe(name, K, bk, bm, bn=128):
        A = jnp.asarray(rng.integers(-127, 127, (M, K)).astype(np.int8))
        B = rng.integers(-127, 127, (K, N)).astype(np.int8)
        try:
            raw = _build_qmatmul(M, K, N, bm, bn, bk, 0, "UPWARD", -128, 127,
                                 "int32", False, False)

            def fn(a):
                with _x32_tracing():
                    return raw(a, B)

            rec(name, per_iter_chain_samples(fn, A, fb2, samples=5),
                macs=M * K * N)
        except Exception as e:  # noqa: BLE001
            fail(name, e)

    mm_probe("mm_tap_k128_bm4096", 128, 128, 4096)
    mm_probe("mm_k1152_bk128_bm1024", 1152, 128, 1024)
    mm_probe("mm_k1152_bk128_bm4096", 1152, 128, 4096)
    mm_probe("mm_k1152_bk384_bm1024", 1152, 384, 1024)
    mm_probe("mm_k1152_bk384_bm4096", 1152, 384, 4096)
    mm_probe("mm_k1152_bk1152_bm1024", 1152, 1152, 1024)
    mm_probe("mm_k1152_bk1152_bm2048", 1152, 1152, 2048)
    mm_probe("mm_m4096_k4096_n512_bk1024", 4096, 1024, 512, 512)

    # ---------------- conv kernels ----------------
    pad = k // 2
    hph, wph = h + 2 * pad, _round_up(w + 2 * pad, 4)
    cin_p, cout_p = _round_up(cin, 128), _round_up(cout, 128)
    m1 = np.broadcast_to(np.int32(mult), (1, cout_p))
    s1 = np.broadcast_to(np.int32(shift), (1, cout_p))
    b1 = np.zeros((1, cout_p), np.int32)

    def make_flat(bm):
        fh, mp, fhx = _flat_lengths(n, hph, wph, k, k, bm)
        xpad = np.zeros((n, hph, wph, cin), np.int8)
        xpad[:, pad:pad + h, pad:pad + w, :] = x4
        xf = np.zeros((fhx, cin_p), np.int8)
        xf[: n * fh, :cin] = xpad.reshape(n * fh, cin)
        return fh, mp, fhx, xf

    wfull = np.zeros((k, k, cin_p, cout_p), np.int8)
    wfull[:, :, :cin, :cout] = wt

    def kernel_probe(name, bm, layout=None):
        fh, mp, fhx, xf = make_flat(bm)
        try:
            kern = _build_flat_conv(mp, fhx, cin_p, cout_p, k, k, wph, bm,
                                    128, 128, True, 0, "UPWARD", -128, 127,
                                    "int8", shift_values, False, layout)

            def fn(a):
                with _x32_tracing():
                    return kern(a, wfull, b1, m1, s1)

            out = np.asarray(fn(jnp.asarray(xf)))
            got = out[: n * fh].reshape(n, hph, wph, cout_p)[:, :h, :w, :cout]
            if not np.array_equal(got, ref):
                fail(name, ValueError("OUTPUT MISMATCH"))
                return
            rec(name, per_iter_chain_samples(fn, jnp.asarray(xf), fb2,
                                             samples=5), macs=conv_macs)
        except Exception as e:  # noqa: BLE001
            fail(name, e)

    kernel_probe("conv_kernel_base_bm4096", 4096)
    kernel_probe("conv_kernel_base_bm1024", 1024)

    # R: row-taps pre-stacked on channels in HBM -> kwp deep-K dots
    cin_r = k * cin_p
    wps = _phase_weights(jnp.asarray(wt), 1, 1)
    wf4 = np.asarray(jnp.pad(wps, ((0, 0), (0, 0), (0, cin_p - cin),
                                   (0, cout_p - cout))))
    wr = np.ascontiguousarray(
        wf4.transpose(1, 0, 2, 3).reshape(1, k, cin_r, cout_p))

    def r_probe(name, bm, bk_r, e2e=False):
        fh, mp, fhx, xf = make_flat(bm)
        fh_r, mp_r, fhx_r = _flat_lengths(n, hph, wph, 1, k, bm)
        need = fhx_r + (k - 1) * wph
        xpad = np.zeros((n, hph, wph, cin), np.int8)
        xpad[:, pad:pad + h, pad:pad + w, :] = x4
        xf_big = np.zeros((need, cin_p), np.int8)
        xf_big[: n * fh_r, :cin] = xpad.reshape(n * fh_r, cin)
        xr = np.concatenate(
            [xf_big[a * wph: a * wph + fhx_r] for a in range(k)], axis=1)
        try:
            rfn = _build_flat_conv(mp_r, fhx_r, cin_r, cout_p, 1, k, wph, bm,
                                   128, bk_r, True, 0, "UPWARD", -128, 127,
                                   "int8", shift_values, False, None)

            if e2e:
                def fn(a):
                    parts = [lax.slice(a, (ai * wph, 0),
                                       (ai * wph + fhx_r, cin_p))
                             for ai in range(k)]
                    with _x32_tracing():
                        return rfn(jnp.concatenate(parts, axis=1),
                                   wr, b1, m1, s1)
                x0 = jnp.asarray(xf_big)
            else:
                def fn(a):
                    with _x32_tracing():
                        return rfn(a, wr, b1, m1, s1)
                x0 = jnp.asarray(xr)

            out = np.asarray(fn(x0))
            got = out[: n * fh_r].reshape(
                n, hph, wph, cout_p)[:, :h, :w, :cout]
            if not np.array_equal(got, ref):
                fail(name, ValueError("OUTPUT MISMATCH"))
                return
            rec(name, per_iter_chain_samples(fn, x0, fb2, samples=5),
                macs=conv_macs)
        except Exception as e:  # noqa: BLE001
            fail(name, e)

    r_probe("conv_R_kernel_bm1024_bk384", 1024, 384)
    r_probe("conv_R_kernel_bm2048_bk384", 2048, 384)
    r_probe("conv_R_kernel_bm1024_bk1152", 1024, cin_r)
    r_probe("conv_R_e2e_bm1024_bk384", 1024, 384, e2e=True)

    # wrapper total for reference
    def wrap_fn(a):
        return qconv2d_flat(a, wt, multiplier=mult, shift=shift,
                            strides=(1, 1), padding=(1, 1, 1, 1))

    def fb4(a, out):
        return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0])

    try:
        rec("conv_wrap_default", per_iter_chain_samples(wrap_fn, xj, fb4,
                                                        samples=5),
            macs=conv_macs)
    except Exception as e:  # noqa: BLE001
        fail("conv_wrap_default", e)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
