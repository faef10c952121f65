"""Narrowed T-stack probe: headline shape only, bm=512, two formulations of
the sublane-stacked deep-K operand (lax.concatenate vs stack+reshape), with
progress prints to localize slow/wedged Mosaic compiles."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

PEAK_TOPS = 394.7


def build(mode, mp, fhx, cin_p, cout_p, khp, kwp, wph, bm, bn, shift_values,
          interpret=False):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tachikoma_tpu.ops.pallas.qms32 import q_multiply_shift_select

    pad = fhx - mp

    def kernel(x_ref, w_ref, bias_ref, m_ref, s_ref, o_ref):
        m0 = pl.multiple_of(pl.program_id(0) * bm, bm)
        win = x_ref[:, pl.ds(m0, bm + pad)]
        bk = win.shape[0]
        part = None
        for b in range(kwp):
            parts = [lax.slice(win, (0, a * wph + b), (bk, a * wph + b + bm))
                     for a in range(khp)]
            if mode == "concat":
                patch = jnp.concatenate(parts, axis=0)      # (khp*bk, bm)
                d = lax.dot_general(
                    patch, w_ref[b], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            elif mode == "stack":
                patch = jnp.stack(parts, axis=0)             # (khp, bk, bm)
                d = lax.dot_general(
                    patch, w_ref[b].reshape(khp, bk, bn),
                    (((0, 1), (0, 1)), ((), ())),
                    preferred_element_type=jnp.int32)
            else:  # "dots": control — khp separate dots, no stacking
                d = None
                for a in range(khp):
                    dd = lax.dot_general(
                        parts[a], w_ref[b].reshape(khp, bk, bn)[a],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    d = dd if d is None else d + dd
            part = d if part is None else part + d
        acc = part + bias_ref[...]
        v = q_multiply_shift_select(acc, m_ref[...], s_ref[...],
                                    shift_values, "UPWARD")
        o_ref[...] = jnp.clip(v, jnp.int32(-128),
                              jnp.int32(127)).astype(o_ref.dtype)

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
        _flat_lengths, _phase_weights, _round_up)
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.ops.pallas.matmul_int8 import _x32_tracing
    from tachikoma_tpu.utils.timing import per_iter_chain

    print("device:", jax.devices()[0].device_kind, flush=True)
    mult, shift = plan_requantize(0.0004, 0.05)
    sv = (int(shift),)
    n, h, w, cin, cout, k = 8, 56, 56, 128, 128, 3
    rng = np.random.default_rng(0)
    x = rng.integers(-127, 127, (n, h, w, cin)).astype(np.int8)
    wt = rng.integers(-127, 127, (k, k, cin, cout)).astype(np.int8)
    pad = 1
    hph, wph = h + 2, _round_up(w + 2, 4)
    macs = n * h * w * cout * k * k * cin
    cin_p = cout_p = 128
    bm = 512

    m1 = jnp.broadcast_to(jnp.int32(mult), (1, 128))
    s1 = jnp.broadcast_to(jnp.int32(shift), (1, 128))
    b1 = jnp.zeros((1, 128), jnp.int32)
    wps = _phase_weights(jnp.asarray(wt), 1, 1)
    wfull = np.asarray(wps)
    wr = np.ascontiguousarray(
        wfull.transpose(1, 0, 2, 3).reshape(k, k * 128, 128))

    fh, mp, fhx = _flat_lengths(n, hph, wph, k, k, bm)
    xpad = np.zeros((n, hph, wph, cin), np.int8)
    xpad[:, 1:1 + h, 1:1 + w, :] = x
    xf = np.zeros((fhx, cin_p), np.int8)
    xf[: n * fh, :cin] = xpad.reshape(n * fh, cin)
    xt = np.ascontiguousarray(xf.T)

    # oracle from the known-good base kernel output is not needed: modes
    # cross-check each other ("dots" is the control, khp separate dots)
    ref = None
    for mode in ("dots", "stack", "concat"):
        print(f"--- building {mode}", flush=True)
        fn = build(mode, mp, fhx, cin_p, cout_p, k, k, wph, bm, 128, sv)

        def run(a, _f=fn):
            with _x32_tracing():
                return _f(a, wr, b1, m1, s1)

        try:
            out = np.asarray(jax.jit(run)(xt))[: n * fh]
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        if ref is None:
            ref = out
            tag = "REF"
        else:
            tag = "EXACT" if (out == ref).all() else "MISMATCH!!!"
        print(f"{mode}: computed [{tag}]; timing...", flush=True)

        def feedback(a, o):
            return a.at[0, 0].add(o[0, 0].astype(jnp.int8))

        per = per_iter_chain(run, jnp.asarray(xt), feedback)
        tops = 2 * macs / per / 1e12
        print(f"{mode}: {per*1e6:7.1f}us {tops:6.1f}TOPS"
              f"({tops/PEAK_TOPS:4.0%})", flush=True)


if __name__ == "__main__":
    main()
