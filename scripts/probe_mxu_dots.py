"""Probe: pure MXU dot-rate ceiling for conv-shaped int8 dots on v5e.

The flat conv kernel's per-cell work is T dots of (bm, bk) x (bk, bn).
This probe measures the SAME dot sequence from resident VMEM with zero
slicing/shuffling/epilogue, sweeping the dot K-depth, to separate
"the MXU just runs (512,128,128) dots this fast" from kernel overheads.
"""

import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tachikoma_tpu.utils.timing import per_iter_chain

PEAK_TOPS = 394.7


def make_fn(cells, bm, k, n, taps):
    def kernel(x_ref, w_ref, o_ref):
        part = None
        for t in range(taps):
            d = jnp.dot(x_ref[...], w_ref[t], preferred_element_type=jnp.int32)
            part = d if part is None else part + d
        o_ref[...] = part

    @jax.jit
    def fn(x, w):
        return pl.pallas_call(
            kernel,
            grid=(cells,),
            in_specs=[
                pl.BlockSpec((bm, k), lambda i: (i, 0)),
                pl.BlockSpec((taps, k, n), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((cells * bm, n), jnp.int32),
        )(x, w)

    return fn


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    # headline-equivalent work: 55 cells x 9 taps x (512,128)x(128,128)
    cases = [
        # (cells, bm, k, n, taps) — MACs held ~constant where possible
        (54, 512, 128, 128, 9),    # conv baseline dot mix
        (54, 512, 384, 128, 3),    # "r"-style: 3 deep-K dots
        (54, 512, 1152, 128, 1),   # "c"-style: 1 deep-K dot
        (54, 512, 128, 256, 9),    # wider N (if cout were 256)
        (54, 1024, 128, 128, 9),   # taller M
        (54, 2048, 128, 128, 9),
        (27, 512, 128, 128, 18),   # more taps per cell, fewer cells
        (108, 512, 128, 128, 9),   # 2x cells: linearity check
    ]
    for (cells, bm, k, n, taps) in cases:
        x = rng.integers(-127, 127, (cells * bm, k)).astype(np.int8)
        w = rng.integers(-127, 127, (taps, k, n)).astype(np.int8)
        fn = make_fn(cells, bm, k, n, taps)
        macs = cells * taps * bm * k * n

        def feedback(a, out):
            bit = (out.sum(dtype=jnp.int32) & 1).astype(jnp.int8)
            return a ^ bit

        try:
            per = per_iter_chain(lambda a: fn(a, w), x, feedback)
        except Exception as e:
            print(f"cells={cells} bm={bm} K={k} N={n} taps={taps}: FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)
            continue
        tops = 2 * macs / per / 1e12
        print(f"cells={cells:4d} bm={bm:5d} K={k:5d} N={n:4d} taps={taps:2d}: "
              f"{per * 1e6:8.1f} us  {tops:7.1f} TOPS  {tops / PEAK_TOPS:5.1%}",
              flush=True)


if __name__ == "__main__":
    main()
