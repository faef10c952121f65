"""Round-3 conv roofline push: measure kernel variants toward >=60%.

Phase A: raw kernel at the headline geometry across layout variants x
         model-ranked blockings (what is the best achievable single-conv
         number, and which layout wins?)
Phase B: chain per-conv time at depths 3 and 6 with the best raw config
         (how close does the graph-resident form get to raw?)
Phase C: stride-2 polyphase and BERT-shape dense — the two known-slow
         families (verdict item 7).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/conv60_experiments.py [A B C]

Writes every measurement to the tune DB; prints a summary table.
"""

import sys

import numpy as np

V5E_INT8_TOPS = 394.7


def _db():
    from tachikoma_tpu.tune.database import TuneDatabase

    return TuneDatabase("tachikoma_tpu/tune/tophub_v5e.jsonl")


def _record(db, workload, cfg, t, macs):
    from tachikoma_tpu.tune.database import NO_ERROR, TuneRecord

    db.add(TuneRecord(workload, cfg, t * 1e3, NO_ERROR,
                      "", meta={"tops": round(tops(macs, t), 2)}))


def tops(macs, t):
    return 2 * macs / t / 1e12


def frac(tp):
    return tp / V5E_INT8_TOPS


def phase_a():
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.utils.timing import per_iter_chain

    geoms = [
        (8, 56, 56, 128, 128, 3),   # headline
        (8, 28, 28, 256, 256, 3),
        (8, 14, 14, 256, 256, 3),
    ]
    rng = np.random.default_rng(0)
    m, s = plan_requantize(0.0004, 0.05)
    db = _db()
    from tachikoma_tpu.ops.pallas.conv_flat import flat_conv_workload

    results = []
    for (n, h, w, cin, cout, k) in geoms:
        x = jnp.asarray(rng.integers(-127, 127, (n, h, w, cin)).astype(np.int8))
        wt = rng.integers(-127, 127, (k, k, cin, cout)).astype(np.int8)
        macs = n * h * w * cout * k * k * cin
        # reference output for correctness gating: the auto-picked kernel
        # (certified bit-exact vs the numpy oracle by the CPU suite)
        ref = np.asarray(qconv2d_flat(x, wt, multiplier=m, shift=s,
                                      strides=(1, 1), padding=(1, 1, 1, 1)))
        cout_p = -(-cout // 128) * 128
        cands = [None] + [
            (bm, bn, bk)
            for bm in (512, 1024, 2048, 4096)
            for bn in (128, 256)
            for bk in (128, 256)
            # only grids that tile the padded channel dims are runnable
            # (a bn > cout_p grid has ZERO N cells: unwritten output)
            if bn <= cout_p and cout_p % bn == 0
            and bk <= cin and cin % bk == 0
        ]
        for layout in (None, "t", "r", "w", "s"):
            for blocks in cands:
                def fn(a, _l=layout, _b=blocks):
                    return qconv2d_flat(a, wt, multiplier=m, shift=s,
                                        strides=(1, 1),
                                        padding=(1, 1, 1, 1),
                                        blocks=_b, layout=_l)

                def feedback(a, out):
                    # scalar tap: every candidate here is a Pallas call
                    # (opaque to XLA, cannot be narrowed); a full-output
                    # XOR costs an extra ~12us HBM pass per iteration and
                    # taxes every reading (measured). Wrong-result/zero-
                    # grid candidates are killed by the verification gate.
                    return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0])

                try:
                    got = np.asarray(fn(x))
                    if not np.array_equal(got, ref):
                        print(f"A {n}x{h}x{w}x{cin}->{cout} k{k} "
                              f"layout={layout} blocks={blocks}: WRONG "
                              f"RESULT (not recorded)", flush=True)
                        continue
                    t = per_iter_chain(fn, x, feedback, repeats=2)
                except Exception as e:
                    print(f"A {n}x{h}x{w}x{cin}->{cout} k{k} layout={layout} "
                          f"blocks={blocks}: FAIL {type(e).__name__}",
                          flush=True)
                    continue
                tp = tops(macs, t)
                if frac(tp) > 1.0:
                    print(f"A {n}x{h}x{w}x{cin}->{cout} k{k} layout={layout} "
                          f"blocks={blocks}: IMPOSSIBLE {tp:.1f} TOPS "
                          f"(not recorded)", flush=True)
                    continue
                results.append((f"{h}x{w}x{cin}", layout, blocks, tp))
                cfg = ({"blocks": list(blocks)} if blocks
                       else {"kernel": "auto"})
                if layout:
                    cfg["layout"] = layout
                _record(db, flat_conv_workload(n, h, w, cin, cout, k, k,
                                               (1, 1), True, 1),
                        cfg, t, macs)
                print(f"A {n}x{h}x{w}x{cin}->{cout} k{k} layout={layout} "
                      f"blocks={blocks}: {t*1e6:.1f} us = {tp:.1f} TOPS "
                      f"({100*frac(tp):.1f}%)", flush=True)
    best = {}
    for g, l, b, tp in results:
        if g not in best or tp > best[g][2]:
            best[g] = (l, b, tp)
    for g, (l, b, tp) in best.items():
        print(f"A BEST {g}: layout={l} blocks={b} {tp:.1f} TOPS "
              f"({100*frac(tp):.1f}%)", flush=True)
    return best


def phase_b(best=None):
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat_chain
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.utils.timing import per_iter_chain

    n, h, w, c = 8, 56, 56, 128
    rng = np.random.default_rng(0)
    m, s = plan_requantize(0.0004, 0.05)
    macs1 = n * h * w * c * 9 * c
    for depth in (3, 6):
        stages = [dict(w=rng.integers(-127, 127, (3, 3, c, c)).astype(np.int8),
                       bias=rng.integers(-500, 500, (c,)).astype(np.int32),
                       multiplier=m, shift=s, izp=0, out_zp=0,
                       padding=(1, 1, 1, 1)) for _ in range(depth)]
        x = jnp.asarray(rng.integers(-127, 127, (n, h, w, c)).astype(np.int8))
        for bn_cap in (None, 256):
            def fn(a, _bn=bn_cap):
                if _bn:
                    return qconv2d_flat_chain(a, stages, bn_cap=_bn)
                return qconv2d_flat_chain(a, stages)

            def feedback(a, out):
                # Pallas chain: scalar tap is dependence enough (opaque)
                return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0])

            try:
                t = per_iter_chain(fn, x, feedback, repeats=2) / depth
            except Exception as e:
                print(f"B depth={depth} bn_cap={bn_cap}: FAIL "
                      f"{type(e).__name__}: {e}", flush=True)
                continue
            tp = tops(macs1, t)
            print(f"B chain depth={depth} bn_cap={bn_cap}: {t*1e6:.1f} us/conv"
                  f" = {tp:.1f} TOPS ({100*frac(tp):.1f}%)", flush=True)


def phase_c():
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import qconv2d_flat
    from tachikoma_tpu.ops.pallas.matmul_int8 import qmatmul_int8
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.utils.timing import per_iter_chain

    rng = np.random.default_rng(0)
    m, s = plan_requantize(0.0004, 0.05)

    # stride-2 conv 56->28
    n, h, w, cin, cout, k = 8, 56, 56, 128, 128, 3
    x = jnp.asarray(rng.integers(-127, 127, (n, h, w, cin)).astype(np.int8))
    wt = rng.integers(-127, 127, (k, k, cin, cout)).astype(np.int8)
    macs = n * 28 * 28 * cout * k * k * cin
    ref_s2 = np.asarray(qconv2d_flat(x, wt, multiplier=m, shift=s,
                                     strides=(2, 2), padding=(1, 1, 1, 1)))
    for layout in (None, "t"):
        for blocks in (None, (512, 128, 512), (1024, 128, 512),
                       (2048, 128, 512), (2048, 128, 256)):
            def fn(a, _l=layout, _b=blocks):
                return qconv2d_flat(a, wt, multiplier=m, shift=s,
                                    strides=(2, 2), padding=(1, 1, 1, 1),
                                    blocks=_b, layout=_l)

            def feedback(a, out):
                # Pallas-only candidates: scalar tap (see phase A note)
                return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0])

            try:
                if not np.array_equal(np.asarray(fn(x)), ref_s2):
                    print(f"C s2 layout={layout} blocks={blocks}: WRONG "
                          f"RESULT (not recorded)", flush=True)
                    continue
                t = per_iter_chain(fn, x, feedback, repeats=2)
            except Exception as e:
                print(f"C s2 layout={layout} blocks={blocks}: FAIL "
                      f"{type(e).__name__}", flush=True)
                continue
            print(f"C s2 layout={layout} blocks={blocks}: {t*1e6:.1f} us = "
                  f"{tops(macs, t):.1f} TOPS useful "
                  f"({100*frac(tops(macs, t)):.1f}%)", flush=True)

    # attribution: how much of stride-2 is the XLA phase-split pass?
    from tachikoma_tpu.ops.pallas.conv_flat import _phase_stack

    def split_only(a):
        xs, _ = _phase_stack(a, 3, 3, 2, 2, (1, 1, 1, 1), 0)
        return xs

    def fb2(a, out):
        return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0])

    try:
        t = per_iter_chain(split_only, x, fb2, repeats=2)
        print(f"C s2 phase-split alone: {t*1e6:.1f} us", flush=True)
    except Exception as e:
        print(f"C s2 phase-split alone: FAIL {type(e).__name__}", flush=True)

    # BERT-shape dense (skinny M)
    db = _db()
    from tachikoma_tpu.tune.tuner import matmul_workload

    for (M, K, N) in [(512, 768, 768), (512, 768, 3072), (512, 3072, 768),
                      (512, 768, 2304)]:
        A = jnp.asarray(rng.integers(-127, 127, (M, K)).astype(np.int8))
        B = rng.integers(-127, 127, (K, N)).astype(np.int8)
        macs = M * K * N
        ref_mm = np.asarray(qmatmul_int8(A, B, multiplier=m, shift=s))
        for blocks in (None, (512, 256, 768), (512, 768, 768),
                       (256, 512, 768), (512, 512, 384), (512, 1024, 768),
                       "xla"):
            def fn(a, _b=blocks):
                return qmatmul_int8(a, B, multiplier=m, shift=s, blocks=_b)

            def feedback(a, out, _b=blocks):
                if _b == "xla":
                    # XLA impl CAN be narrowed: row-reduced full dependence
                    return a.at[:, 0].add((out & 1).sum(axis=1)
                                          .astype(jnp.int8))
                return a.at[0, 0].add(out[0, 0].astype(jnp.int8))

            try:
                if blocks is not None and not np.array_equal(
                        np.asarray(fn(A)), ref_mm):
                    print(f"C dense {M}x{K}x{N} blocks={blocks}: WRONG "
                          f"RESULT (not recorded)", flush=True)
                    continue
                t = per_iter_chain(fn, A, feedback, repeats=2)
            except Exception as e:
                print(f"C dense {M}x{K}x{N} blocks={blocks}: FAIL "
                      f"{type(e).__name__}", flush=True)
                continue
            _record(db, matmul_workload(M, K, N, True),
                    ({"impl": "xla"} if blocks == "xla"
                     else {"blocks": list(blocks)} if blocks
                     else {"kernel": "auto"}), t, macs)
            print(f"C dense {M}x{K}x{N} blocks={blocks}: {t*1e6:.1f} us = "
                  f"{tops(macs, t):.1f} TOPS ({100*frac(tops(macs, t)):.1f}%)",
                  flush=True)


def main():
    import jax

    import os

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/tk_jaxcache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], flush=True)
    phases = sys.argv[1:] or ["A", "B", "C"]
    if "A" in phases:
        phase_a()
    if "B" in phases:
        phase_b()
    if "C" in phases:
        phase_c()


if __name__ == "__main__":
    main()
