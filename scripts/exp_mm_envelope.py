"""Matmul perf envelope at conv-like aspect ratios (raw + fused epilogue).

Establishes the practical ceiling for any matmul-based conv at the headline
shape: M = N*OH*OW(+overwide), K = taps*CIN, N = COUT.
"""
import numpy as np

PEAK = 394.7


def main():
    import jax
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.matmul_int8 import qmatmul_int8
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.utils.timing import per_iter_chain

    print("device:", jax.devices()[0], flush=True)
    shapes = [
        # (M, K, N, blocks)
        (28160, 128, 128, None),
        (28160, 1152, 128, None),
        (28160, 1152, 128, (2048, 128, 1152)),
        (28160, 128, 1152, None),
        (28160, 1152, 512, None),
        (28160, 2048, 128, None),
        (28160, 4096, 128, None),
        (4096, 4096, 4096, None),
        (4096, 4096, 128, None),
    ]
    m_, s_ = plan_requantize(0.0004, 0.05)
    for (M, K, N, blocks) in shapes:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(-127, 127, (M, K)).astype(np.int8))
        w = rng.integers(-127, 127, (K, N)).astype(np.int8)
        for fuse in (False, True):
            def fn(a, _f=fuse):
                if _f:
                    return qmatmul_int8(a, w, multiplier=m_, shift=s_,
                                        blocks=blocks)
                return qmatmul_int8(a, w, blocks=blocks)

            def feedback(a, out):
                bit = (out.sum(dtype=jnp.int32) & 1).astype(jnp.int8)
                return a ^ bit

            try:
                per = per_iter_chain(fn, x, feedback)
            except Exception as e:
                print(f"M{M} K{K} N{N} fuse={fuse}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            tops = 2 * M * K * N / per / 1e12
            print(f"M{M} K{K} N{N} b={blocks} fuse={int(fuse)}: "
                  f"{per*1e6:8.1f} us  {tops:7.1f} TOPS  {tops/PEAK:5.1%}",
                  flush=True)


if __name__ == "__main__":
    main()
