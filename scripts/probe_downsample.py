"""Probe: why does the ResNet 1x1 stride-2 downsample cost 1.65 ms?
Times the int8 spatial subsample formulations and the full op."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.utils.timing import per_iter_chain

    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 127, (8, 56, 56, 256)).astype(np.int8))
    wt = rng.integers(-127, 127, (1, 1, 256, 512)).astype(np.int8)
    m, s = plan_requantize(0.0004, 0.05)

    def sub_stride(a):
        return a[:, ::2, ::2, :].reshape(8 * 28 * 28, 256)

    def sub_reshape(a):
        r = a.reshape(8, 28, 2, 28, 2, 256)
        return lax.slice(r, (0, 0, 0, 0, 0, 0),
                         (8, 28, 1, 28, 1, 256)).reshape(8 * 28 * 28, 256)

    def sub_lanefold(a):
        # fold the W pairs into lanes, take the first 256 lanes (lane slice)
        r = a.reshape(8, 28, 2, 28, 2 * 256)
        r = lax.slice(r, (0, 0, 0, 0, 0), (8, 28, 1, 28, 256))
        return r.reshape(8 * 28 * 28, 256)

    def full_op(a):
        return qconv2d_flat(a, wt, multiplier=m, shift=s, strides=(2, 2),
                            padding=(0, 0, 0, 0))

    def feedback2(a, out):
        return a.at[0, 0, 0, 0].add(out[0, 0].astype(jnp.int8))

    def feedback4(a, out):
        return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0])

    for name, fn, fb in (("stride-slice ", sub_stride, feedback2),
                         ("reshape-slice", sub_reshape, feedback2),
                         ("lane-fold    ", sub_lanefold, feedback2),
                         ("full 1x1 s2  ", full_op, feedback4)):
        try:
            per = per_iter_chain(fn, x, fb)
            print(f"{name}: {per*1e6:8.1f} us", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
