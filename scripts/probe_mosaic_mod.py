"""Mosaic capability probe: vector integer mod/floor-div by a constant,
iota-derived border masks, and the cost of mask-multiplied tap dots.

Decides whether the borderless (masked-tap) flat conv is implementable:
its per-tap masks need x = m % W and y = (m // W) % H computed in-kernel
on int32 vectors (W, H compile-time constants).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_mosaic_mod.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("device:", jax.devices()[0].device_kind, flush=True)

    BM, BK = 512, 128
    W, H = 56, 56

    # --- probe 1: vector mod/div by constants on an iota --------------------
    def k_mod(x_ref, o_ref):
        i = jax.lax.broadcasted_iota(jnp.int32, (BM, BK), 0)
        base = pl.program_id(0) * BM
        t = i + base
        x = jax.lax.rem(t, W)
        y = jax.lax.rem(jax.lax.div(t, W), H)
        m = ((x > 0) & (y > 0)).astype(jnp.int8)
        o_ref[...] = x_ref[...] * m

    x = np.ones((2048, BK), np.int8)
    try:
        fn = pl.pallas_call(
            k_mod,
            out_shape=jax.ShapeDtypeStruct((2048, BK), jnp.int8),
            grid=(2048 // BM,),
            in_specs=[pl.BlockSpec((BM, BK), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((BM, BK), lambda i: (i, 0)),
        )
        out = np.asarray(jax.jit(fn)(x))
        rows = np.arange(2048)
        exp = ((rows % W > 0) & ((rows // W) % H > 0)).astype(np.int8)
        ok = np.array_equal(out, exp[:, None] * x)
        print(f"mod/div probe: COMPILES, correct={ok}", flush=True)
    except Exception as e:
        print(f"mod/div probe: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return

    # --- probe 2: masked-tap dot overhead -----------------------------------
    from tachikoma_tpu.utils.timing import per_iter_chain

    FHX, COUT = 25600, 128
    wmat = np.random.default_rng(0).integers(-127, 127,
                                             (9, BK, COUT)).astype(np.int8)

    def mk(masked):
        def kern(x_ref, w_ref, o_ref):
            m0 = pl.multiple_of(pl.program_id(0) * BM, BM)
            win = x_ref[pl.ds(m0, BM + 128), :]
            i = jax.lax.broadcasted_iota(jnp.int32, (BM, BK), 0)
            t = i + m0
            xq = jax.lax.rem(t, W)
            yq = jax.lax.rem(jax.lax.div(t, W), H)
            part = None
            for tap in range(9):
                a, b = divmod(tap, 3)
                off = a * 32 + b * 4  # aligned strides for the probe
                patch = jax.lax.slice(win, (off, 0), (off + BM, BK))
                if masked:
                    valid = ((xq + b > 0) & (xq + b <= W)
                             & (yq + a > 0) & (yq + a <= H))
                    patch = jnp.where(valid, patch, 0)
                d = jnp.dot(patch, w_ref[tap],
                            preferred_element_type=jnp.int32)
                part = d if part is None else part + d
            o_ref[...] = (part >> 8).astype(jnp.int8)

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((FHX - 512, COUT), jnp.int8),
            grid=((FHX - 512) // BM,),
            in_specs=[
                pl.BlockSpec((FHX, BK), lambda i: (0, 0)),
                pl.BlockSpec((9, BK, COUT), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((BM, COUT), lambda i: (i, 0)),
        )

    xbig = np.random.default_rng(1).integers(-127, 127,
                                             (FHX, BK)).astype(np.int8)

    for name, masked in (("plain", False), ("masked", True)):
        try:
            f = mk(masked)
            jf = jax.jit(lambda a, _f=f: _f(a, wmat))
            _ = np.asarray(jf(jnp.asarray(xbig)))

            def feedback(a, out):
                return a.at[0, 0].add(out[0, 0])

            t = per_iter_chain(jf, jnp.asarray(xbig), feedback, repeats=3)
            macs = (FHX - 512) * 9 * BK * COUT
            print(f"tap-dot {name}: {t*1e6:.1f} us  "
                  f"({2*macs/t/1e12:.1f} TOPS)", flush=True)
        except Exception as e:
            print(f"tap-dot {name}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
