"""Attribute the chain-interior overhead: raw kernel vs +vmask vs +frame.

The deep-chain probe put the chain-INTERIOR per-conv at ~44 us while the
raw kernel measures ~30-36 us at the same geometry.  This probe builds
kernel variants that add ONE chain feature at a time and times them
interleaved (3 rounds, min) so tunnel drift cannot masquerade as a delta:

  V0  raw kernel, image-sized input            (the baseline)
  V1  V0 + vmask input + masked store          (the garbage-cell masking)
  V2  V1 + frame-shifted output (grid +1 block, clamped window, off_base)
  V3  V2 reading a frame-sized input with lead (true interior shape)

TIMING ONLY — outputs are not checked and nothing is recorded to the DB.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_frame_overhead.py
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

PEAK_TOPS = 394.7


def build_variant(mp, fhx, cin_p, cout_p, wph, bm, bn, bk, shift_values,
                  *, vmask: bool, frame_out: bool, off_base: int = 0):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tachikoma_tpu.ops.pallas.qms32 import q_multiply_shift_select

    taps = tuple((a, b) for a in range(3) for b in range(3))
    n_k = cin_p // bk
    grid_m = (mp + bm if frame_out else mp) // bm
    grid = (grid_m, cout_p // bn, n_k)
    pad = fhx - mp

    def kernel(x_ref, w_ref, bias_ref, m_ref, s_ref, *rest):
        if vmask:
            vmask_ref, o_ref, acc_ref = rest
        else:
            o_ref, acc_ref = rest
        m0 = pl.multiple_of(pl.program_id(0) * bm, bm)
        offs = {(a, b): a * wph + b + off_base for (a, b) in taps}
        mn = min(offs.values())
        wbase = (mn // 32) * 32 if mn >= 0 else -((-mn + 31) // 32) * 32
        offs = {k: v - wbase for k, v in offs.items()}
        start = m0 + wbase
        if wbase < 0:
            start = pl.multiple_of(jnp.maximum(start, 0), 32)
        win = x_ref[pl.ds(start, bm + pad), :]
        bkc = win.shape[-1]
        wlen = bm + pad - 4
        wins = {}
        for r in sorted({o % 4 for o in offs.values()}):
            wins[r] = lax.slice(win, (r, 0), (r + wlen, bkc))
        part = None
        for (a, b) in taps:
            off = offs[(a, b)]
            r = off % 4
            patch = lax.slice(wins[r], (off - r, 0), (off - r + bm, bkc))
            d = jnp.dot(patch, w_ref[a, b], preferred_element_type=jnp.int32)
            part = d if part is None else part + d
        acc = part + bias_ref[...]
        v = q_multiply_shift_select(acc, m_ref[...], s_ref[...],
                                    shift_values, "UPWARD")
        v = jnp.clip(v, jnp.int32(-128), jnp.int32(127))
        if vmask:
            v = jnp.where(vmask_ref[...] != 0, v, jnp.int32(0))
        o_ref[...] = v.astype(o_ref.dtype)

    out_rows = mp + 2 * bm if frame_out else mp
    in_specs = [
        pl.BlockSpec((fhx, bk), lambda i, j, k: (0, k)),
        pl.BlockSpec((3, 3, bk, bn), lambda i, j, k: (0, 0, k, j)),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
    ]
    if vmask:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, k: (i, 0)))
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, cout_p), jnp.int8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )
    return jax.jit(fn)


def main():
    import jax
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import (_flat_lengths, _round_up,
                                                    chain_frame_geometry)
    from tachikoma_tpu.ops.pallas.matmul_int8 import _x32_tracing
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.utils.timing import per_iter_chain

    print("device:", jax.devices()[0].device_kind, flush=True)
    n, h, w, cin, cout = 8, 56, 56, 128, 128
    rng = np.random.default_rng(0)
    mult, shift = plan_requantize(0.0004, 0.05)
    sv = (int(shift),)
    macs = n * h * w * cout * 9 * cin
    cin_p, cout_p = 128, 128

    for bm in (512, 1024):
        geo = chain_frame_geometry(
            n, h, w, [(3, 3, 1, 1, 1, 1)] * 3, bm)
        wph, hp, fh, mp, fhx0, slack0 = geo
        wt = rng.integers(-127, 127, (3, 3, cin_p, cout_p)).astype(np.int8)
        m1 = np.broadcast_to(np.int32(mult), (1, cout_p))
        s1 = np.broadcast_to(np.int32(shift), (1, cout_p))
        b1 = np.zeros((1, cout_p), np.int32)

        # V0/V1/V2 read an image-shaped flat input (fhx0 rows)
        ximg = rng.integers(-127, 127, (fhx0, cin_p)).astype(np.int8)
        vm = rng.integers(0, 2, (mp + bm, cout_p)).astype(np.int8)
        # V3 reads a frame-shaped input (lead + mp + bm tail)
        xfrm = rng.integers(-127, 127, (mp + 2 * bm, cin_p)).astype(np.int8)

        variants = {
            "V0 raw": (build_variant(mp, fhx0, cin_p, cout_p, wph, bm, 128,
                                     128, sv, vmask=False, frame_out=False),
                       ximg, False),
            "V1 +vmask": (build_variant(mp, fhx0, cin_p, cout_p, wph, bm,
                                        128, 128, sv, vmask=True,
                                        frame_out=False),
                          ximg, True),
            "V2 +frame-out": (build_variant(mp, fhx0, cin_p, cout_p, wph, bm,
                                            128, 128, sv, vmask=True,
                                            frame_out=True, off_base=-bm),
                              ximg, True),
            "V3 frame-in/out": (build_variant(
                mp, mp + 2 * bm, cin_p, cout_p, wph, bm, 128, 128, sv,
                vmask=True, frame_out=True, off_base=-(1 * wph + 1)),
                xfrm, True),
        }

        results = {k: [] for k in variants}
        for rnd in range(3):
            for name, (fn, xa, has_vm) in variants.items():
                if has_vm:
                    def call(a, _f=fn):
                        with _x32_tracing():
                            return _f(a, wt, b1, m1, s1, vm)
                else:
                    def call(a, _f=fn):
                        with _x32_tracing():
                            return _f(a, wt, b1, m1, s1)

                def feedback(a, out):
                    return a.at[0, 0].add(out[0, 0])

                try:
                    t = per_iter_chain(call, jnp.asarray(xa), feedback,
                                       repeats=2)
                    results[name].append(t)
                except Exception as e:
                    print(f"bm={bm} {name}: FAIL {type(e).__name__}: "
                          f"{str(e)[:140]}", flush=True)
                    results[name].append(float("nan"))
        for name, ts in results.items():
            best = np.nanmin(ts)
            tp = 2 * macs / best / 1e12
            print(f"bm={bm} {name}: {best*1e6:7.1f} us  {tp:6.1f} TOPS "
                  f"({100*tp/PEAK_TOPS:4.1f}%)  runs="
                  + ",".join(f"{t*1e6:.1f}" for t in ts), flush=True)


if __name__ == "__main__":
    main()
