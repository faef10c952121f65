"""Quick on-TPU benchmark of the flat conv kernel at the headline shape."""
import sys

import numpy as np


def per_iter(fn, x, feedback, repeats=3):
    from tachikoma_tpu.utils.timing import per_iter_chain

    return per_iter_chain(fn, x, feedback, repeats=repeats)


def main():
    import jax
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize

    print("device:", jax.devices()[0])
    shapes = [
        # (n, h, w, cin, cout, k, stride)  — ResNet-50 body shapes
        (8, 56, 56, 128, 128, 3, 1),   # headline
        (8, 28, 28, 256, 256, 3, 1),
        (8, 14, 14, 512, 512, 3, 1),
        (8, 56, 56, 128, 128, 3, 2),   # polyphase stride 2
        (8, 56, 56, 256, 64, 1, 1),    # 1x1 -> matmul
        (8, 56, 56, 64, 256, 1, 1),
        (8, 14, 14, 1024, 256, 1, 1),
    ]
    blocks = None
    if len(sys.argv) > 1:
        blocks = tuple(int(v) for v in sys.argv[1].split(","))
    for (n, h, w, cin, cout, k, s) in shapes:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(-127, 127, (n, h, w, cin)).astype(np.int8))
        wt = rng.integers(-127, 127, (k, k, cin, cout)).astype(np.int8)
        m, sh_ = plan_requantize(0.0004, 0.05)
        pad = (k // 2,) * 4

        def fn(a):
            return qconv2d_flat(a, wt, multiplier=m, shift=sh_,
                                strides=(s, s), padding=pad, blocks=blocks)

        def feedback(a, out):
            import jax.numpy as jnp
            bit = (out.sum(dtype=jnp.int32) & 1).astype(jnp.int8)
            return a ^ bit

        try:
            per = per_iter(fn, x, feedback)
        except Exception as e:
            print(f"{(n,h,w,cin,cout,k,s)}: FAILED {type(e).__name__}: {e}")
            continue
        oh = ow = (h + 2 * (k // 2) - k) // s + 1
        macs = n * oh * ow * cout * k * k * cin
        tops = 2 * macs / per / 1e12
        frac = tops / 394.7
        print(f"{(n,h,w,cin,cout,k,s)}: {per*1e6:8.1f} us  {tops:7.1f} TOPS"
              f"  roofline {frac:5.1%}")


if __name__ == "__main__":
    main()
