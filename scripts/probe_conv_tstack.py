"""Probe: transposed stacked-K conv kernel ("T" prototype) on v5e.

probe_conv_stackedK showed deep-K (384) dots run the headline conv at 66%
of roofline but HBM pre-stacking costs ~26us.  This variant gets the deep-K
operand with ZERO data movement: in the transposed layout (CIN, FHX) the
kernel-row taps a are LANE shifts (native), and concatenating the khp
row-tap slices along SUBLANES at cin_p=128 multiples is vreg-tile-aligned
(renaming, no shuffle):

    win   = x_ref[:, m0 : m0+bm+pad]            # (bk, window)
    patch = concat_a win[:, a*wph+b : ...+bm]   # (khp*bk, bm)  free
    acc  += dot_general(patch, wr[b], contract lhs0/rhs0)   # K = khp*bk

Compares base / production-t / T-stacked at ResNet shapes, bit-exact check
against the base kernel.
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

PEAK_TOPS = 394.7


def build_tstack(mp, fhx, cin_p, cout_p, khp, kwp, wph, bm, bn,
                 shift_values, rounding="UPWARD", out_zp=0,
                 qmin=-128, qmax=127, interpret=False):
    """T-stacked kernel: x (cin_p, fhx) int8, w (kwp, khp*cin_p, cout_p),
    out (mp, cout_p) int8 fused-requantized.  Single K block (cin_p <= 512
    after stacking is fine for VMEM at ResNet shapes)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tachikoma_tpu.ops.pallas.qms32 import q_multiply_shift_select

    pad = fhx - mp

    def kernel(x_ref, w_ref, bias_ref, m_ref, s_ref, o_ref):
        m0 = pl.multiple_of(pl.program_id(0) * bm, bm)
        win = x_ref[:, pl.ds(m0, bm + pad)]      # (cin_p, bm+pad)
        bk = win.shape[0]
        dn = (((0,), (0,)), ((), ()))
        part = None
        for b in range(kwp):
            parts = [lax.slice(win, (0, a * wph + b), (bk, a * wph + b + bm))
                     for a in range(khp)]
            patch = (jnp.concatenate(parts, axis=0) if khp > 1
                     else parts[0])              # (khp*bk, bm)
            d = lax.dot_general(patch, w_ref[b], dimension_numbers=dn,
                                preferred_element_type=jnp.int32)
            part = d if part is None else part + d
        acc = part + bias_ref[...]
        v = q_multiply_shift_select(acc, m_ref[...], s_ref[...],
                                    shift_values, rounding)
        if out_zp:
            v = v + jnp.int32(out_zp)
        o_ref[...] = jnp.clip(v, jnp.int32(qmin),
                              jnp.int32(qmax)).astype(o_ref.dtype)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, cout_p), jnp.int8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(mp // bm, cout_p // bn),
            in_specs=[
                pl.BlockSpec((cin_p, fhx), lambda i, j: (0, 0)),
                pl.BlockSpec((kwp, khp * cin_p, bn), lambda i, j: (0, 0, j)),
                pl.BlockSpec((1, bn), lambda i, j: (0, j)),
                pl.BlockSpec((1, bn), lambda i, j: (0, j)),
                pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )
    return jax.jit(fn)


def main():
    import jax
    import jax.numpy as jnp

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

        m1 = jnp.broadcast_to(jnp.int32(mult), (1, cout_p))
        s1 = jnp.broadcast_to(jnp.int32(shift), (1, cout_p))
        b1 = jnp.zeros((1, cout_p), jnp.int32)

        wps = _phase_weights(jnp.asarray(wt), 1, 1)
        wfull = np.asarray(jnp.pad(wps, ((0, 0), (0, 0), (0, cin_p - cin),
                                         (0, cout_p - cout))))
        # T-stacked weights: (kwp, khp*cin_p, cout_p) rows a-major per b
        wr = np.ascontiguousarray(
            wfull.transpose(1, 0, 2, 3).reshape(kwp, khp * cin_p, cout_p))

        for bm in (512, 1024):
            fh, mp, fhx = _flat_lengths(n, hph, wph, khp, kwp, bm)
            xpad = np.zeros((n, hph, wph, cin), np.int8)
            xpad[:, pad:pad + h, pad:pad + w, :] = x
            xf = np.zeros((fhx, cin_p), np.int8)
            xf[: n * fh, :cin] = xpad.reshape(n * fh, cin)
            xt = np.ascontiguousarray(xf.T)      # (cin_p, fhx)

            base = _build_flat_conv(
                mp, fhx, cin_p, cout_p, khp, kwp, wph, bm,
                min(128, cout_p), min(128, cin_p), True, 0, "UPWARD",
                -128, 127, "int8", shift_values, False, None)
            tst = build_tstack(mp, fhx, cin_p, cout_p, khp, kwp, wph, bm,
                               min(128, cout_p), shift_values)

            def run_base(a):
                with _x32_tracing():
                    return base(a, wfull, b1, m1, s1)

            def run_t(a):
                with _x32_tracing():
                    return tst(a, wr, b1, m1, s1)

            def feedback(a, out):
                bit = out[0, 0].astype(jnp.int8)
                return a.at[0, 0].add(bit)

            try:
                ob = np.asarray(jax.jit(run_base)(xf))[: n * fh]
                ot = np.asarray(jax.jit(run_t)(xt))[: n * fh]
            except Exception as e:
                print(f"{(n,h,w,cin,cout,k)} bm={bm}: T BUILD FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                continue
            tag = "EXACT" if (ob == ot).all() else "MISMATCH!!!"

            res = {}
            for name, fn_, a0 in (("base", run_base, xf),
                                  ("Tstk", run_t, xt)):
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
