"""Probe: qconv2d_flat op-level time vs raw kernel time at the headline
shape — isolates the XLA wrapper cost (input pad/flatten, output slice)
that bench.py pays on top of the Pallas kernel (39.2us at blocks
(512,128,128) per probe_conv_stackedK)."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

PEAK_TOPS = 394.7


def main():
    import jax
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.utils.timing import per_iter_chain

    print("device:", jax.devices()[0].device_kind, flush=True)
    n, h, w, cin, cout, k = 8, 56, 56, 128, 128, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 127, (n, h, w, cin)).astype(np.int8))
    wt = rng.integers(-127, 127, (k, k, cin, cout)).astype(np.int8)
    m, s = plan_requantize(0.0004, 0.05)
    macs = n * h * w * cout * k * k * cin

    cases = [
        ("tunedDB  ", None, None),
        ("base512  ", (512, 128, 128), None),
        ("base1024 ", (1024, 128, 128), None),
        ("t512     ", (512, 128, 128), "t"),
    ]
    for name, blocks, lay in cases:
        def fn(a, _b=blocks, _l=lay):
            return qconv2d_flat(a, wt, multiplier=m, shift=s,
                                strides=(1, 1), padding=(1, 1, 1, 1),
                                blocks=_b, layout=_l)

        def feedback(a, out):
            return a ^ (out & 1)      # bench.py's full-output feedback

        def fb_cheap(a, out):
            return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0])

        try:
            per = per_iter_chain(fn, x, feedback)
            per_c = per_iter_chain(fn, x, fb_cheap)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        tops = 2 * macs / per / 1e12
        tops_c = 2 * macs / per_c / 1e12
        print(f"{name}: full-fb {per*1e6:7.1f}us {tops:6.1f}TOPS"
              f"({tops/PEAK_TOPS:4.0%})   cheap-fb {per_c*1e6:7.1f}us "
              f"{tops_c:6.1f}TOPS({tops_c/PEAK_TOPS:4.0%})", flush=True)


if __name__ == "__main__":
    main()
