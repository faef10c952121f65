"""Probe: row-stacked deep-K conv ("R" layout prototype) vs the base flat
kernel on v5e.

probe_mxu_dots showed 3 dots of (bm,384)x(384,128) run ~2x faster than the 9
(bm,128)x(128,128) tap dots of the base kernel at identical MACs.  This
prototypes the conv that exploits it WITHOUT a new Pallas kernel: pre-stack
the khp row-taps along channels in HBM,

    xr[m, a*cin_p + c] = xflat[m + a*wph, c]        (K = khp*cin_p)
    wr[0, b, a*cin_p + c, o] = w[a, b, c, o]

and call the existing base kernel with (khp=1, kwp) taps — kwp deep-K dots
per cell.  Exactness: out[m] = sum_b xr[m+b] . wr[0,b]
                              = sum_{a,b} xflat[m+a*wph+b] . w[a,b]  (same).

Measures: base kernel (tuned + fixed blocks), R kernel-only (input
pre-stacked), R end-to-end (stacking inside the jit), and bit-compares
R vs base on-chip.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

PEAK_TOPS = 394.7


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tachikoma_tpu.ops.pallas.conv_flat import (
        _build_flat_conv, _flat_lengths, _phase_weights, _round_up)
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.ops.pallas.matmul_int8 import _x32_tracing
    from tachikoma_tpu.utils.timing import per_iter_chain

    print("device:", jax.devices()[0].device_kind, flush=True)
    mult, shift = plan_requantize(0.0004, 0.05)
    shift_values = (int(shift),)

    shapes = [
        (8, 56, 56, 128, 128, 3),   # headline
        (8, 28, 28, 256, 256, 3),
        (8, 14, 14, 256, 256, 3),
    ]
    for (n, h, w, cin, cout, k) in shapes:
        rng = np.random.default_rng(0)
        x = rng.integers(-127, 127, (n, h, w, cin)).astype(np.int8)
        wt = rng.integers(-127, 127, (k, k, cin, cout)).astype(np.int8)
        khp = kwp = k
        pad = k // 2
        hph, wph = h + 2 * pad, _round_up(w + 2 * pad, 4)
        oh = ow = h
        macs = n * oh * ow * cout * k * k * cin
        cin_p = _round_up(cin, 128)
        cout_p = _round_up(cout, 128)
        cin_r = khp * cin_p

        m1 = jnp.broadcast_to(jnp.int32(mult), (1, cout_p))
        s1 = jnp.broadcast_to(jnp.int32(shift), (1, cout_p))
        b1 = jnp.zeros((1, cout_p), jnp.int32)

        wps = _phase_weights(jnp.asarray(wt), 1, 1)  # (khp,kwp,cin,cout)
        wfull = np.asarray(jnp.pad(wps, ((0, 0), (0, 0), (0, cin_p - cin),
                                         (0, cout_p - cout))))
        # R weights: (1, kwp, khp*cin_p, cout_p), rows ordered a-major
        wr = np.ascontiguousarray(
            wfull.transpose(1, 0, 2, 3).reshape(1, kwp, cin_r, cout_p))

        for bm in (512, 1024):
            fh, mp, fhx = _flat_lengths(n, hph, wph, khp, kwp, bm)
            # base flat image (host): (fhx, cin_p)
            xpad = np.zeros((n, hph, wph, cin), np.int8)
            xpad[:, pad:pad + h, pad:pad + w, :] = x
            xf = np.zeros((fhx, cin_p), np.int8)
            xf[: n * fh, :cin] = xpad.reshape(n * fh, cin)

            # R geometry: only kwp-1 column offsets remain
            fh_r, mp_r, fhx_r = _flat_lengths(n, hph, wph, 1, kwp, bm)
            # stacked source needs fhx_r + (khp-1)*wph rows
            need = fhx_r + (khp - 1) * wph
            xf_big = np.zeros((need, cin_p), np.int8)
            xf_big[: n * fh, :cin] = xpad.reshape(n * fh, cin)
            xr = np.concatenate(
                [xf_big[a * wph: a * wph + fhx_r] for a in range(khp)],
                axis=1)  # (fhx_r, khp*cin_p)

            base = _build_flat_conv(
                mp, fhx, cin_p, cout_p, khp, kwp, wph, bm,
                min(128, cout_p), min(128, cin_p), True, 0, "UPWARD",
                -128, 127, "int8", shift_values, False, None)
            bk_r = min(384, cin_r)
            rfn = _build_flat_conv(
                mp_r, fhx_r, cin_r, cout_p, 1, kwp, wph, bm,
                min(128, cout_p), bk_r, True, 0, "UPWARD",
                -128, 127, "int8", shift_values, False, None)

            def run_base(a):
                with _x32_tracing():
                    return base(a, wfull, b1, m1, s1)

            def run_r(a):
                with _x32_tracing():
                    return rfn(a, wr, b1, m1, s1)

            def run_r_e2e(a):
                # a: (need, cin_p) unstacked flat image; stack inside the jit
                parts = [lax.slice(a, (ai * wph, 0), (ai * wph + fhx_r, cin_p))
                         for ai in range(khp)]
                with _x32_tracing():
                    return rfn(jnp.concatenate(parts, axis=1),
                               wr, b1, m1, s1)

            def feedback(a, out):
                bit = out[0, 0].astype(jnp.int8)
                return a.at[0, 0].add(bit)

            # exactness first
            try:
                ob = np.asarray(jax.jit(run_base)(xf))[: n * fh]
                orr = np.asarray(jax.jit(run_r)(xr))[: n * fh]
            except Exception as e:
                print(f"{(n,h,w,cin,cout,k)} bm={bm}: R BUILD FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                continue
            tag = "EXACT" if (ob == orr).all() else "MISMATCH!!!"

            res = {}
            for name, fn_, a0 in (("base", run_base, xf),
                                  ("Rker", run_r, xr),
                                  ("Re2e", run_r_e2e, xf_big)):
                try:
                    per = per_iter_chain(fn_, jnp.asarray(a0), feedback)
                    res[name] = per
                except Exception as e:
                    print(f"  {name} FAILED {type(e).__name__}: "
                          f"{str(e)[:120]}", flush=True)
                    res[name] = float("nan")
            line = f"{(n,h,w,cin,cout,k)} bm={bm:5d} [{tag}]"
            for name, per in res.items():
                tops = 2 * macs / per / 1e12
                line += (f"  {name}: {per*1e6:7.1f}us "
                         f"{tops:6.1f}TOPS({tops/PEAK_TOPS:4.0%})")
            print(line, flush=True)


if __name__ == "__main__":
    main()
