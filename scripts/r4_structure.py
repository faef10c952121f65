"""Round-4 decisive structure + epilogue experiments (v5e).

Two hypotheses from the round-3 ledgers (/tmp/r4/ledger*.json):

H1 (dot depth): int8 dot rate follows either a per-dot fill bubble
    rate(K) = 356*K/(K+91), or a 256-deep int8 pass model
    rate(K) ~ K/(256*ceil(K/256)).  Discriminated by single-dot rates at
    K in {128,256,384,512,768,1152} with a CHEAP (clip+cast int8) store.

H2 (epilogue): the fused requantize epilogue costs ~21 us at (28672,128)
    (ledger3: mm_k128 raw 4.5 us vs fused 26.2 us) — rivaling the dots —
    because q_multiply_shift needs a 4-multiply 32-bit mulhi emulation.
    Candidate fix "rq25": clamp acc to the per-channel output-active window
    first (exact by monotonicity of q in acc), then a 2-multiply 16-bit
    split with a shift-fold identity — exact for total right shift n<=37.

Candidate kernels measured here (all OUTPUT-VERIFIED before timing):
  conv_base_*  — today's 9-tap kernel with each epilogue variant
  wide_*       — ONE (bm+pad,128)@(128,1152) dot, taps combined by shifted
                 int32 slices summed as SSA values (no scratch RMW)
  pair_i8      — taps paired via 2x128 lane-concat -> K=256 dots

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_structure.py

Incremental JSON to $R4_OUT (default /tmp/r4/structure.json); reruns skip
completed probes.
"""

import json
import os

import numpy as np

V5E_INT8_TOPS = 394.7
OUT = os.environ.get("R4_OUT", "/tmp/r4/structure.json")
ONLY = [s for s in os.environ.get("R4_ONLY", "").split(",") if s]

results = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        results = json.load(f)


def _want(name):
    if name in results and "error" not in results.get(name, {}):
        print("skip (done):", name, flush=True)
        return False
    if ONLY and not any(name.startswith(p) for p in ONLY):
        return False
    return True


def rec(name, samples, macs=None):
    from tachikoma_tpu.utils.timing import median_iqr

    med, iqr = median_iqr(samples)
    d = {"med_us": round(med * 1e6, 2), "iqr_us": round(iqr * 1e6, 2)}
    if macs:
        d["tops"] = round(2 * macs / med / 1e12, 1)
        d["frac"] = round(d["tops"] / V5E_INT8_TOPS, 4)
    results[name] = d
    print(name, json.dumps(d), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def fail(name, e):
    results[name] = {"error": repr(e)[:300]}
    print(name, "FAILED:", repr(e)[:300], flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


# ---------------------------------------------------------------------------
# rq25: clamp + 2-multiply exact requantize (UPWARD, per-tensor prototype)
# ---------------------------------------------------------------------------

def rq25_plan(mult, shift, out_zp, qmin=-128, qmax=127, tight=False):
    """Host-side plan. n = 31 - shift must be in [33, 37] for the 16-split
    (|v|<=2^15 after clamp keeps both partial products in int32).

    tight=True ("rq26"): clamp acc to [smallest v with q(v)=qmin-zp,
    largest v with q(v)=qmax-zp] — valid because the requantize ratio
    m*2^(s-31) < 1 makes q's steps 0/1, so both endpoints are attained —
    and the final output clip becomes a no-op (dropped)."""
    n = 31 - int(shift)
    assert 33 <= n <= 37, n
    mh, ml = mult >> 16, mult & 0xFFFF
    # q(v) >= t  <=>  v*m + 2^(n-1) >= t*2^n  <=>  v >= ceil((2t-1)*2^(n-1)/m)
    def ge_bound(t):
        num = (2 * t - 1) * (1 << (n - 1))
        return -((-num) // mult)  # ceil(num/mult), any sign
    if tight:
        bhi = ge_bound(qmax - out_zp + 1) - 1  # largest v: q == qmax-zp
        blo = ge_bound(qmin - out_zp)          # smallest v: q == qmin-zp
    else:
        bhi = ge_bound(qmax - out_zp)          # v >= bhi  ->  q >= qmax-zp
        blo = ge_bound(qmin - out_zp + 1) - 1  # v <= blo  ->  q <= qmin-zp
    assert max(abs(blo), abs(bhi)) < (1 << 15), (blo, bhi)
    return dict(n=n, mh=mh, ml=ml, blo=blo, bhi=bhi,
                c=1 << (n - 17), zp=out_zp, qmin=qmin, qmax=qmax,
                tight=tight)


def rq25_np(acc, plan):
    v = np.clip(acc.astype(np.int64), plan["blo"], plan["bhi"])
    q = (v * plan["mh"] + plan["c"] + ((v * plan["ml"]) >> 16)) >> (plan["n"] - 16)
    q = q + plan["zp"]
    if not plan["tight"]:
        q = np.clip(q, plan["qmin"], plan["qmax"])
    return q.astype(np.int8)


def rq25_jnp(acc, plan):
    import jax.numpy as jnp

    i32 = jnp.int32
    v = jnp.clip(acc, i32(plan["blo"]), i32(plan["bhi"]))
    q = (v * i32(plan["mh"]) + i32(plan["c"])
         + ((v * i32(plan["ml"])) >> i32(16))) >> i32(plan["n"] - 16)
    if plan["zp"]:
        q = q + i32(plan["zp"])
    if not plan["tight"]:
        q = jnp.clip(q, i32(plan["qmin"]), i32(plan["qmax"]))
    return q.astype(jnp.int8)


def selftest_rq25():
    from tachikoma_tpu.ops.fixed_point import q_multiply_shift_np

    rng = np.random.default_rng(7)
    rng = np.random.default_rng(7)
    for trial in range(24):
        shift = -int(rng.integers(2, 7))            # n in [33, 37]
        mult = int(rng.integers(1 << 30, (1 << 31) - 1))
        zp = int(rng.integers(-8, 9))
        for tight in (False, True):
            plan = rq25_plan(mult, shift, zp, tight=tight)
            v = np.concatenate([
                rng.integers(-(1 << 25), 1 << 25, 20000),
                np.arange(plan["blo"] - 40, plan["bhi"] + 40),
                np.array([-(1 << 31), (1 << 31) - 1, 0, 1, -1]),
            ]).astype(np.int64).astype(np.int32)
            ref = np.clip(q_multiply_shift_np(v, mult, shift, "UPWARD") + zp,
                          -128, 127).astype(np.int8)
            got = rq25_np(v, plan)
            if not np.array_equal(ref, got):
                bad = np.nonzero(ref != got)[0][:5]
                raise AssertionError(
                    f"rq25 mismatch trial={trial} tight={tight} m={mult} "
                    f"s={shift} zp={zp} v={v[bad]} ref={ref[bad]} got={got[bad]}")
    print("rq25 host self-test: OK (24 plans x 2 x ~53k values)", flush=True)


# ---------------------------------------------------------------------------

def main():
    selftest_rq25()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tachikoma_tpu.ops.pallas.conv_flat import (_flat_lengths, _round_up,
                                                    qconv2d_flat)
    from tachikoma_tpu.ops.pallas.matmul_int8 import _x32_tracing
    from tachikoma_tpu.ops.pallas.qms32 import (plan_requantize,
                                                q_multiply_shift_select)
    from tachikoma_tpu.utils.timing import per_iter_chain_samples

    print("devices:", jax.devices(), flush=True)

    rng = np.random.default_rng(0)
    M, N = 28672, 128
    mult, shift = plan_requantize(0.0004, 0.05)   # ratio 0.008 -> shift -6
    mult, shift = int(mult), int(shift)
    print("requantize plan: m=%d s=%d n=%d" % (mult, shift, 31 - shift),
          flush=True)
    plan = rq25_plan(mult, shift, 0)
    plan_t = rq25_plan(mult, shift, 0, tight=True)
    shift_values = (shift,)

    def fb(a, out):
        return a.at[(0,) * a.ndim].add(out[(0,) * out.ndim].astype(a.dtype))

    # ---------------- epilogues ----------------
    def epi_i8(acc):
        return jnp.clip(acc, jnp.int32(-128), jnp.int32(127)).astype(jnp.int8)

    def epi_rqfull(acc):
        v = q_multiply_shift_select(acc, jnp.int32(mult), None,
                                    shift_values, "UPWARD")
        return jnp.clip(v, jnp.int32(-128), jnp.int32(127)).astype(jnp.int8)

    def epi_rq25(acc):
        return rq25_jnp(acc, plan)

    def epi_rq26(acc):
        return rq25_jnp(acc, plan_t)

    def np_epi(name, acc):
        from tachikoma_tpu.ops.fixed_point import q_multiply_shift_np
        if name == "i8":
            return np.clip(acc, -128, 127).astype(np.int8)
        if name == "rqfull":
            return np.clip(q_multiply_shift_np(acc, mult, shift, "UPWARD"),
                           -128, 127).astype(np.int8)
        if name == "rq25":
            return rq25_np(acc, plan)
        if name == "rq26":
            return rq25_np(acc, plan_t)
        raise KeyError(name)

    EPIS = {"i8": epi_i8, "rqfull": epi_rqfull, "rq25": epi_rq25,
            "rq26": epi_rq26}

    # ---------------- generic M-blocked mm probe ----------------
    def build_mm(K, bm, epi, raw=False):
        def kern(x_ref, w_ref, o_ref):
            acc = jnp.dot(x_ref[...], w_ref[...],
                          preferred_element_type=jnp.int32)
            o_ref[...] = acc if raw else epi(acc)

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(
                (M, N), jnp.int32 if raw else jnp.int8),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(M // bm,),
                in_specs=[pl.BlockSpec((bm, K), lambda i: (i, 0)),
                          pl.BlockSpec((K, N), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0)),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K, transcendentals=0,
                bytes_accessed=M * K + K * N + M * N),
        )

    def mm_probe(name, K, bm, epi_name, raw=False):
        if not _want(name):
            return
        X = rng.integers(-127, 128, (M, K)).astype(np.int8)
        W = rng.integers(-127, 128, (K, N)).astype(np.int8)
        try:
            kern = build_mm(K, bm, EPIS.get(epi_name), raw=raw)

            def fn(a):
                with _x32_tracing():
                    return kern(a, W)

            xj = jnp.asarray(X)
            got = np.asarray(fn(xj))
            acc = (X.astype(np.float64) @ W.astype(np.float64)).astype(
                np.int64).astype(np.int32)
            want = acc if raw else np_epi(epi_name, acc)
            if not np.array_equal(got, want):
                nbad = int((got != want).sum())
                fail(name, ValueError(f"OUTPUT MISMATCH ({nbad} cells)"))
                return
            rec(name, per_iter_chain_samples(fn, xj, fb, samples=5),
                macs=M * K * N)
        except Exception as e:  # noqa: BLE001
            fail(name, e)

    # H1: K-depth curve with cheap store
    for K in (128, 256, 384, 512, 768, 1024, 1152):
        mm_probe(f"mm_i8_k{K}", K, 4096 if K <= 512 else 2048, "i8")
    # H2: epilogue decomposition
    mm_probe("mm_raw_k128", 128, 4096, None, raw=True)
    mm_probe("mm_rqfull_k128", 128, 4096, "rqfull")
    mm_probe("mm_rq25_k128", 128, 4096, "rq25")
    mm_probe("mm_rqfull_k1152", 1152, 2048, "rqfull")
    mm_probe("mm_rq25_k1152", 1152, 2048, "rq25")

    # ---------------- conv geometry ----------------
    n, h, w, cin, cout, k = 8, 56, 56, 128, 128, 3
    pad_hw = k // 2
    hph, wph = h + 2 * pad_hw, _round_up(w + 2 * pad_hw, 4)
    conv_macs = n * h * w * cout * k * k * cin
    x4 = rng.integers(-127, 128, (n, h, w, cin)).astype(np.int8)
    wt = rng.integers(-127, 128, (k, k, cin, cout)).astype(np.int8)
    taps = tuple((a, b) for a in range(k) for b in range(k))

    xj4 = jnp.asarray(x4)
    ref_rq = np.asarray(qconv2d_flat(xj4, wt, multiplier=mult, shift=shift,
                                     strides=(1, 1), padding=(1, 1, 1, 1)))

    def make_flat(bm):
        fh, mp, fhx = _flat_lengths(n, hph, wph, k, k, bm)
        xpad = np.zeros((n, hph, wph, cin), np.int8)
        xpad[:, pad_hw:pad_hw + h, pad_hw:pad_hw + w, :] = x4
        xf = np.zeros((fhx, cin), np.int8)
        xf[: n * fh] = xpad.reshape(n * fh, cin)
        return fh, mp, fhx, xf

    def make_flat_tight(bm):
        from tachikoma_tpu.ops.pallas.conv_flat import _flat_lengths_tight

        r = _flat_lengths_tight(n, hph, wph, h, w, k, k, bm)
        assert r is not None
        fh, mp, fhx, hp, slack = r
        xpad = np.zeros((n, hp, wph, cin), np.int8)
        xpad[:, pad_hw:pad_hw + h, pad_hw:pad_hw + w, :] = x4
        xf = xpad.reshape(n * fh, cin)
        return fh, mp, fhx, xf

    def conv_oracle(xf, mp, epi_name):
        acc = np.zeros((mp, N), np.int64)
        xd = xf.astype(np.float64)
        for t, (a, b) in enumerate(taps):
            off = a * wph + b
            acc += (xd[off:off + mp] @ wt[a, b].astype(np.float64)
                    ).astype(np.int64)
        return np_epi(epi_name, acc.astype(np.int32))

    def check_conv(name, got, fh, mp, epi_name, xf):
        if epi_name == "rqfull":
            # kernel output is the over-wide flat frame: output pixel (i, j)
            # sits at flat row i*wph + j (ledger2 extraction)
            got4 = got[: n * fh].reshape(n, hph, wph, N)[:, :h, :w, :]
            ok = np.array_equal(got4, ref_rq)
        else:
            want = conv_oracle(xf, mp, epi_name)
            ok = np.array_equal(got[:mp], want)
        return ok

    # base structure: 9 SSA tap dots
    def build_conv_base(mp, fhx, bm, epi, wslack):
        def kern(x_ref, w_ref, o_ref):
            m0 = pl.multiple_of(pl.program_id(0) * bm, bm)
            win = x_ref[pl.ds(m0, bm + wslack), :]
            wlen = bm + wslack - 4
            wins = {}
            for r in sorted({(a * wph + b) % 4 for (a, b) in taps}):
                wins[r] = lax.slice(win, (r, 0), (r + wlen, cin))
            part = None
            for (a, b) in taps:
                off = a * wph + b
                r = off % 4
                patch = lax.slice(wins[r], (off - r, 0), (off - r + bm, cin))
                d = jnp.dot(patch, w_ref[a, b],
                            preferred_element_type=jnp.int32)
                part = d if part is None else part + d
            o_ref[...] = epi(part)

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((mp, N), jnp.int8),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(mp // bm,),
                in_specs=[pl.BlockSpec((fhx, cin), lambda i: (0, 0)),
                          pl.BlockSpec((k, k, cin, N), lambda i: (0, 0, 0, 0))],
                out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0)),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=2 * conv_macs, transcendentals=0,
                bytes_accessed=fhx * cin + 9 * cin * N + mp * N),
        )

    # wide-N structure: ONE (bm+pad,128)@(128,1152) dot + shifted SSA sums
    def build_conv_wide(mp, fhx, bm, epi, wslack):
        wwide = np.concatenate([wt[a, b] for (a, b) in taps], axis=1)

        def kern(x_ref, w_ref, o_ref):
            m0 = pl.multiple_of(pl.program_id(0) * bm, bm)
            win = x_ref[pl.ds(m0, bm + wslack), :]
            wide = jnp.dot(win, w_ref[...], preferred_element_type=jnp.int32)
            part = None
            for t, (a, b) in enumerate(taps):
                off = a * wph + b
                sl = lax.slice(wide, (off, t * N), (off + bm, (t + 1) * N))
                part = sl if part is None else part + sl
            o_ref[...] = epi(part)

        fn = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((mp, N), jnp.int8),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(mp // bm,),
                in_specs=[pl.BlockSpec((fhx, cin), lambda i: (0, 0)),
                          pl.BlockSpec((cin, 9 * N), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0)),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=int(2 * conv_macs * (mp + wslack) // mp),
                transcendentals=0,
                bytes_accessed=fhx * cin + 9 * cin * N + mp * N),
        )
        return fn, wwide

    # pair structure: 2x128 lane-concats -> 4 K=256 dots + 1 K=128
    def build_conv_pair(mp, fhx, bm, epi, wslack):
        order = [taps[i] for i in range(9)]
        wpair = np.concatenate([wt[a, b] for (a, b) in order], axis=0)

        def kern(x_ref, w_ref, o_ref):
            m0 = pl.multiple_of(pl.program_id(0) * bm, bm)
            win = x_ref[pl.ds(m0, bm + wslack), :]
            wlen = bm + wslack - 4
            wins = {}
            for r in sorted({(a * wph + b) % 4 for (a, b) in taps}):
                wins[r] = lax.slice(win, (r, 0), (r + wlen, cin))

            def tap_patch(a, b):
                off = a * wph + b
                r = off % 4
                return lax.slice(wins[r], (off - r, 0), (off - r + bm, cin))

            part = None
            for p in range(4):
                t0, t1 = order[2 * p], order[2 * p + 1]
                patch = jnp.concatenate([tap_patch(*t0), tap_patch(*t1)],
                                        axis=1)
                d = jnp.dot(patch, w_ref[2 * p * cin:(2 * p + 2) * cin],
                            preferred_element_type=jnp.int32)
                part = d if part is None else part + d
            d = jnp.dot(tap_patch(*order[8]), w_ref[8 * cin:9 * cin],
                        preferred_element_type=jnp.int32)
            part = part + d
            o_ref[...] = epi(part)

        fn = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((mp, N), jnp.int8),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(mp // bm,),
                in_specs=[pl.BlockSpec((fhx, cin), lambda i: (0, 0)),
                          pl.BlockSpec((9 * cin, N), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0)),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=2 * conv_macs, transcendentals=0,
                bytes_accessed=fhx * cin + 9 * cin * N + mp * N),
        )
        return fn, wpair

    def conv_probe(name, builder, bm, epi_name, make=None):
        if not _want(name):
            return
        fh, mp, fhx, xf = (make or make_flat)(bm)
        wslack = fhx - mp
        try:
            built = builder(mp, fhx, bm, EPIS[epi_name], wslack)
            kern, warr = built if isinstance(built, tuple) else (built, wt)

            def fn(a):
                with _x32_tracing():
                    return kern(a, warr)

            xj = jnp.asarray(xf)
            got = np.asarray(fn(xj))
            if not check_conv(name, got, fh, mp, epi_name, xf):
                fail(name, ValueError("OUTPUT MISMATCH"))
                return
            rec(name, per_iter_chain_samples(fn, xj, fb, samples=5),
                macs=conv_macs)
        except Exception as e:  # noqa: BLE001
            fail(name, e)

    for bm in (2048, 4096):
        conv_probe(f"conv_base_i8_bm{bm}", build_conv_base, bm, "i8")
    conv_probe("conv_base_rqfull_bm4096", build_conv_base, 4096, "rqfull")
    conv_probe("conv_base_rq25_bm4096", build_conv_base, 4096, "rq25")
    conv_probe("conv_base_rq25_bm2048", build_conv_base, 2048, "rq25")
    conv_probe("conv_base_rq25_bm1024", build_conv_base, 1024, "rq25")
    conv_probe("conv_base_rq26_bm4096", build_conv_base, 4096, "rq26")
    # tight single-pad geometry: fewer padded grid rows (mp 27648 vs 28672)
    conv_probe("conv_tight_rq26_bm1024", build_conv_base, 1024, "rq26",
               make=make_flat_tight)
    conv_probe("conv_tight_rq26_bm2048", build_conv_base, 2048, "rq26",
               make=make_flat_tight)
    conv_probe("conv_tight_i8_bm1024", build_conv_base, 1024, "i8",
               make=make_flat_tight)
    for bm in (1024, 2048):
        conv_probe(f"wide_i8_bm{bm}", build_conv_wide, bm, "i8")
    mm_probe("mm_rq26_k128", 128, 4096, "rq26")

    # ---------------- XLA anchors ----------------
    if _want("xla_dot_k1152"):
        try:
            X = rng.integers(-127, 128, (M, 1152)).astype(np.int8)
            W = rng.integers(-127, 128, (1152, N)).astype(np.int8)
            f = jax.jit(lambda a: jnp.dot(a, W, preferred_element_type=jnp.int32))
            xj = jnp.asarray(X)
            got = np.asarray(f(xj))
            want = (X.astype(np.float64) @ W.astype(np.float64)).astype(np.int64)
            if not np.array_equal(got.astype(np.int64), want):
                fail("xla_dot_k1152", ValueError("OUTPUT MISMATCH"))
            else:
                rec("xla_dot_k1152",
                    per_iter_chain_samples(f, xj, fb, samples=5),
                    macs=M * 1152 * N)
        except Exception as e:  # noqa: BLE001
            fail("xla_dot_k1152", e)

    if _want("xla_conv_native"):
        try:
            wj = jnp.asarray(wt)
            f = jax.jit(lambda a: lax.conv_general_dilated(
                a, wj, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32))
            got = np.asarray(f(xj4))
            fh, mp, fhx, xf = make_flat(2048)
            accw = np.zeros((mp, N), np.int64)
            xd = xf.astype(np.float64)
            for (a, b) in taps:
                off = a * wph + b
                accw[...] += (xd[off:off + mp] @ wt[a, b].astype(np.float64)
                              ).astype(np.int64)
            want4 = accw[: n * hph * wph].reshape(n, hph, wph, N)[
                :, :h, :w, :]
            if not np.array_equal(got.astype(np.int64), want4):
                fail("xla_conv_native", ValueError("OUTPUT MISMATCH"))
            else:
                rec("xla_conv_native",
                    per_iter_chain_samples(f, xj4, fb, samples=5),
                    macs=conv_macs)
        except Exception as e:  # noqa: BLE001
            fail("xla_conv_native", e)

    print("DONE", json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
