"""Round-4 ledger, pass 3: sanity anchors for the pass-2 structure numbers.

Pass 2 said a single deep-K dot runs at 330 TOPS — but the implied HBM
traffic (47 MB in 25.6 us = 1.9 TB/s) exceeds the v5e's public 819 GB/s,
so either this part streams faster than the public spec or the protocol
lies.  Anchors, each OUTPUT-VERIFIED before timing:

  * hbm_copy: pure int8 streaming copy (read+write) -> achievable HBM BW.
  * mm K=128 raw int32 out vs FUSED int8 out (4x output-write delta).
  * mm bk=1152 fused int8 out — the conv-relevant deep-K rate with the
    int32 write removed.
  * known-good 4096^3 bk512 config (round-3 bench read 91.7%).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_ledger3.py
"""

import json
import os

import numpy as np

V5E_INT8_TOPS = 394.7
OUT = os.environ.get("R4_OUT", "/tmp/r4/ledger3.json")
results = {}


def rec(name, samples, macs=None, nbytes=None):
    from tachikoma_tpu.utils.timing import median_iqr

    med, iqr = median_iqr(samples)
    d = {"med_us": round(med * 1e6, 2), "iqr_us": round(iqr * 1e6, 2)}
    if macs:
        d["tops"] = round(2 * macs / med / 1e12, 1)
        d["frac"] = round(d["tops"] / V5E_INT8_TOPS, 4)
    if nbytes:
        d["gbps"] = round(nbytes / med / 1e9, 1)
    results[name] = d
    print(name, json.dumps(d), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def fail(name, e):
    results[name] = {"error": repr(e)[:200]}
    print(name, "FAILED:", repr(e)[:200], flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tachikoma_tpu.ops.pallas.matmul_int8 import (_build_qmatmul,
                                                      _x32_tracing)
    from tachikoma_tpu.utils.timing import per_iter_chain_samples

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def fb2(a, out):
        return a.at[0, 0].add(out[0, 0].astype(jnp.int8))

    # ---------------- HBM streaming copy ----------------
    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    ROWS, COLS = 65536, 512  # 32 MB int8
    cfn = pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.int8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(ROWS // 2048,),
            in_specs=[pl.BlockSpec((2048, COLS), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((2048, COLS), lambda i: (i, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )
    big = jnp.asarray(rng.integers(-127, 127, (ROWS, COLS)).astype(np.int8))
    got = np.asarray(cfn(big))
    assert np.array_equal(got, np.asarray(big)), "copy mismatch"
    try:
        rec("hbm_copy_32mb",
            per_iter_chain_samples(cfn, big, lambda a, o: a ^ (o & 1),
                                   samples=5),
            nbytes=2 * ROWS * COLS)
    except Exception as e:  # noqa: BLE001
        fail("hbm_copy_32mb", e)

    # ---------------- verified matmuls ----------------
    M, N = 28672, 128

    def mm_probe(name, K, bk, bm, fuse):
        A8 = rng.integers(-127, 127, (M, K)).astype(np.int8)
        B8 = rng.integers(-127, 127, (K, N)).astype(np.int8)
        A = jnp.asarray(A8)
        try:
            if fuse:
                raw = _build_qmatmul(M, K, N, bm, 128, bk, 0, "UPWARD",
                                     -128, 127, "int8", True, False, (8,))
                b0 = np.zeros((1, N), np.int32)
                m0 = np.full((1, N), 1 << 28, np.int32)
                s0 = np.full((1, N), 8, np.int32)

                def fn(a):
                    with _x32_tracing():
                        return raw(a, B8, b0, m0, s0)
            else:
                raw = _build_qmatmul(M, K, N, bm, 128, bk, 0, "UPWARD",
                                     -128, 127, "int32", False, False)

                def fn(a):
                    with _x32_tracing():
                        return raw(a, B8)

            got = np.asarray(fn(A))
            acc = A8.astype(np.int64) @ B8.astype(np.int64)
            if fuse:
                from tachikoma_tpu.ops.fixed_point import q_multiply_shift_np
                want = np.clip(q_multiply_shift_np(
                    acc.astype(np.int64), 1 << 28, 8, "UPWARD"),
                    -128, 127).astype(np.int8)
            else:
                want = acc.astype(np.int32)
            if not np.array_equal(got, want):
                fail(name, ValueError("OUTPUT MISMATCH"))
                return
            rec(name, per_iter_chain_samples(fn, A, fb2, samples=5),
                macs=M * K * N)
        except Exception as e:  # noqa: BLE001
            fail(name, e)

    mm_probe("mm_k128_raw_i32out", 128, 128, 4096, False)
    mm_probe("mm_k128_fused_i8out", 128, 128, 4096, True)
    mm_probe("mm_k1152_bk1152_raw_i32out", 1152, 1152, 2048, False)
    mm_probe("mm_k1152_bk1152_fused_i8out", 1152, 1152, 2048, True)
    mm_probe("mm_k768_bk768_fused_i8out", 768, 768, 2048, True)
    mm_probe("mm_k512_bk512_fused_i8out", 512, 512, 2048, True)
    mm_probe("mm_k384_bk384_fused_i8out", 384, 384, 2048, True)
    mm_probe("mm_k256_bk256_fused_i8out", 256, 256, 2048, True)

    # known-good anchor: 4096^3 at the round-3 bench blocks (91.7% claimed)
    def mm_big(name, Mb, Kb, Nb, bm, bn, bk):
        A8 = rng.integers(-127, 127, (Mb, Kb)).astype(np.int8)
        B8 = rng.integers(-127, 127, (Kb, Nb)).astype(np.int8)
        A = jnp.asarray(A8)
        try:
            raw = _build_qmatmul(Mb, Kb, Nb, bm, bn, bk, 0, "UPWARD",
                                 -128, 127, "int32", False, False)

            def fn(a):
                with _x32_tracing():
                    return raw(a, B8)

            got = np.asarray(fn(A))
            want = (A8.astype(np.int64) @ B8.astype(np.int64)).astype(np.int32)
            if not np.array_equal(got, want):
                fail(name, ValueError("OUTPUT MISMATCH"))
                return
            rec(name, per_iter_chain_samples(fn, A, fb2, samples=5),
                macs=Mb * Kb * Nb)
        except Exception as e:  # noqa: BLE001
            fail(name, e)

    mm_big("mm_4096cubed_bk1024", 4096, 4096, 4096, 512, 512, 1024)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
