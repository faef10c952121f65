"""On-TPU A/B of flat-conv kernel layouts (baseline / scratch-im2col "s" /
wide-N "w") at ResNet body shapes and several M-blockings.

Writes one line per (shape, layout, blocks): time_us, TOPS, roofline frac.
Run one-at-a-time on the tunnel (see CLAUDE.md rules).
"""
import sys

import numpy as np

PEAK_TOPS = 394.7


def main():
    import jax
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.utils.timing import per_iter_chain

    print("device:", jax.devices()[0], flush=True)
    shapes = [
        (8, 56, 56, 128, 128, 3, 1),   # headline
        (8, 28, 28, 256, 256, 3, 1),
        (8, 14, 14, 256, 256, 3, 1),
    ]
    m, sh_ = plan_requantize(0.0004, 0.05)
    for (n, h, w, cin, cout, k, s) in shapes:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(-127, 127, (n, h, w, cin)).astype(np.int8))
        wt = rng.integers(-127, 127, (k, k, cin, cout)).astype(np.int8)
        pad = (k // 2,) * 4
        oh = ow = (h + 2 * (k // 2) - k) // s + 1
        macs = n * oh * ow * cout * k * k * cin
        for lay in (None, "r"):
            for bm in (512, 1024, 2048):
                blocks = (bm, min(128, cout), min(128, cin))

                def fn(a, _b=blocks, _l=lay):
                    return qconv2d_flat(a, wt, multiplier=m, shift=sh_,
                                        strides=(s, s), padding=pad,
                                        blocks=_b, layout=_l)

                def fn_raw(a, _b=blocks, _l=lay):
                    return qconv2d_flat(a, wt, strides=(s, s), padding=pad,
                                        blocks=_b, layout=_l)

                def feedback(a, out):
                    bit = (out.sum(dtype=jnp.int32) & 1).astype(jnp.int8)
                    return a ^ bit

                try:
                    per = per_iter_chain(fn, x, feedback)
                except Exception as e:
                    print(f"{(n,h,w,cin,cout,k,s)} lay={lay} bm={bm}: "
                          f"FAILED {type(e).__name__}: {str(e)[:140]}",
                          flush=True)
                    continue
                tops = 2 * macs / per / 1e12
                try:
                    def fb32(a, out):
                        bit = (out.sum(dtype=jnp.int32) & 1).astype(jnp.int8)
                        return a ^ bit
                    per_r = per_iter_chain(fn_raw, x, fb32)
                except Exception:
                    per_r = float('nan')
                print(f"{(n,h,w,cin,cout,k,s)} lay={str(lay):4s} bm={bm:5d}: "
                      f"{per*1e6:8.1f} us  {tops:7.1f} TOPS  "
                      f"roofline {tops/PEAK_TOPS:5.1%}  raw {per_r*1e6:8.1f} us",
                      flush=True)


if __name__ == "__main__":
    sys.exit(main())
