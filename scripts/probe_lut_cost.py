"""Attribute the integer softmax/gelu cost on-chip and prototype faster
bit-identical realizations.

BERT ablation: softmax 63 us + gelu 79 us per layer = 62% of layer time.
Variants (timing only; interleaved rounds, min):

  softmax full      current qnn.softmax jax realization
  softmax noexp     exp lookup replaced by identity (isolates exp cost)
  softmax nodiv     normalization division removed (isolates div cost)
  softmax fdiv      division via f32 reciprocal + exact integer fixup
  gelu lut          current qnn.lut packed select
  gelu poly         f32 Horner polynomial (+ exhaustive 256-pt check vs
                    the table — reports how many fixup selects it needs)

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_lut_cost.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from tachikoma_tpu.ir.graph import Node
    from tachikoma_tpu.ops import jax_ops
    from tachikoma_tpu.ops.qnn import LUT_SIZE, SOFTMAX_OUT_ZP, build_lut
    from tachikoma_tpu.utils.timing import per_iter_chain

    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    scale = 0.1

    # ---- softmax variants on the BERT scores shape (b4 s128 h12) ----------
    xs = rng.integers(-128, 128, (48, 128, 128)).astype(np.int8)

    def sm_full(x):
        v = x.astype(jnp.int32)
        m = v.max(axis=-1, keepdims=True)
        d = jnp.clip(m - v, 0, LUT_SIZE - 1)
        p = jax_ops._exp_q15(scale, d)
        ssum = p.sum(axis=-1, keepdims=True, dtype=jnp.int32)
        q = (p * jnp.int32(256) + ssum // jnp.int32(2)) // ssum
        return jnp.clip(q + jnp.int32(SOFTMAX_OUT_ZP), -128, 127).astype(jnp.int8)

    def sm_noexp(x):
        v = x.astype(jnp.int32)
        m = v.max(axis=-1, keepdims=True)
        d = jnp.clip(m - v, 0, LUT_SIZE - 1)
        p = jnp.int32(32768) - d * 7  # stand-in, same dtype/shape
        ssum = p.sum(axis=-1, keepdims=True, dtype=jnp.int32)
        q = (p * jnp.int32(256) + ssum // jnp.int32(2)) // ssum
        return jnp.clip(q + jnp.int32(SOFTMAX_OUT_ZP), -128, 127).astype(jnp.int8)

    def sm_nodiv(x):
        v = x.astype(jnp.int32)
        m = v.max(axis=-1, keepdims=True)
        d = jnp.clip(m - v, 0, LUT_SIZE - 1)
        p = jax_ops._exp_q15(scale, d)
        ssum = p.sum(axis=-1, keepdims=True, dtype=jnp.int32)
        q = p + ssum  # keep the sum, drop the division
        return jnp.clip(q + jnp.int32(SOFTMAX_OUT_ZP), -128, 127).astype(jnp.int8)

    def _exact_div(num, den):
        """floor(num/den) for 0 <= num < 2^30, 0 < den < 2^23, via f32
        reciprocal + one integer fixup step (exact: candidate is within 1)."""
        qf = jnp.floor(num.astype(jnp.float32) / den.astype(jnp.float32))
        q = qf.astype(jnp.int32)
        r = num - q * den
        q = jnp.where(r < 0, q - 1, q)
        r = jnp.where(r < 0, r + den, r)
        return jnp.where(r >= den, q + 1, q)

    def sm_fdiv(x):
        v = x.astype(jnp.int32)
        m = v.max(axis=-1, keepdims=True)
        d = jnp.clip(m - v, 0, LUT_SIZE - 1)
        p = jax_ops._exp_q15(scale, d)
        ssum = p.sum(axis=-1, keepdims=True, dtype=jnp.int32)
        q = _exact_div(p * jnp.int32(256) + ssum // jnp.int32(2), ssum)
        return jnp.clip(q + jnp.int32(SOFTMAX_OUT_ZP), -128, 127).astype(jnp.int8)

    # exactness of fdiv first (CPU-cheap, on-chip values)
    a = np.asarray(jax.jit(sm_full)(xs))
    b = np.asarray(jax.jit(sm_fdiv)(xs))
    print("fdiv exact:", np.array_equal(a, b), flush=True)

    # ---- gelu variants on the BERT ffn shape -------------------------------
    xg = rng.integers(-128, 128, (512, 3072)).astype(np.int8)
    import math

    def gelu(t):
        t = np.asarray(t, np.float64)
        return 0.5 * t * (1 + np.vectorize(math.erf)(t / math.sqrt(2)))

    table = build_lut(gelu, 0.05, 0, 0.05, 0)  # int8 -> int8

    def gelu_lut(x):
        idx = x.astype(jnp.int32) + jnp.int32(128)
        return jax_ops._lut_select(table, idx).astype(jnp.int8)

    # hybrid fit (host): saturated tails handled arithmetically, degree-9
    # Chebyshev on the curved core, margin-guarded fixups for residue points
    t64 = table.astype(np.int64)
    qv = np.arange(-128, 128)
    hi_start = 256
    while hi_start > 0 and t64[hi_start - 1] == qv[hi_start - 1]:
        hi_start -= 1
    lo_end = 0
    while lo_end < 256 and t64[lo_end] == t64[0]:
        lo_end += 1
    core = np.arange(lo_end, hi_start)
    # fit in the NORMALIZED domain [-1, 1]: a raw-index-domain Horner is
    # catastrophically ill-conditioned in f32 (x^9 at x=255)
    a0, a1 = float(lo_end), float(hi_start - 1)
    xn = (2 * core - (a0 + a1)) / (a1 - a0)
    cheb = np.polynomial.chebyshev.Chebyshev.fit(
        xn, t64[core].astype(np.float64), deg=9, domain=[-1, 1])
    coefs = np.array(np.polynomial.chebyshev.cheb2poly(cheb.coef),
                     np.float32)
    sc = np.float32(2.0 / (a1 - a0))
    off = np.float32((a0 + a1) / (a1 - a0))

    def horner_f32(idx_np):
        t = idx_np.astype(np.float32) * sc - off
        acc = np.full(idx_np.shape, coefs[-1], np.float32)
        for c in coefs[:-1][::-1]:
            acc = acc * t + c
        return acc

    # fixups: wrong after rounding OR within FMA-variance margin of a .5
    pc = horner_f32(core)
    rc = np.rint(pc).astype(np.int64)
    frac = np.abs(pc - np.floor(pc) - 0.5)
    mism = core[(rc != t64[core]) | (frac < 0.02)]
    print(f"gelu hybrid: core {len(core)} pts deg9, {len(mism)} fixups, "
          f"tails q>={hi_start-128} ident / q<{lo_end-128} const",
          flush=True)

    def gelu_poly(x):
        xi = x.astype(jnp.int32)
        idx = xi + jnp.int32(128)
        t = idx.astype(jnp.float32) * jnp.float32(sc) - jnp.float32(off)
        acc = jnp.float32(coefs[-1])
        for c in coefs[:-1][::-1]:
            acc = acc * t + jnp.float32(c)
        v = jnp.round(acc).astype(jnp.int32)
        v = jnp.where(idx >= jnp.int32(hi_start), xi, v)
        v = jnp.where(idx < jnp.int32(lo_end), jnp.int32(int(t64[0])), v)
        for k in mism:
            v = jnp.where(idx == jnp.int32(int(k)),
                          jnp.int32(int(t64[k])), v)
        return jnp.clip(v, -128, 127).astype(jnp.int8)

    g1 = np.asarray(jax.jit(gelu_lut)(xg))
    g2 = np.asarray(jax.jit(gelu_poly)(xg))
    print("gelu poly exact:", np.array_equal(g1, g2), flush=True)

    variants = {
        "softmax full": (sm_full, xs),
        "softmax noexp": (sm_noexp, xs),
        "softmax nodiv": (sm_nodiv, xs),
        "softmax fdiv": (sm_fdiv, xs),
        "gelu lut": (gelu_lut, xg),
        "gelu poly": (gelu_poly, xg),
    }
    results = {k: [] for k in variants}
    for rnd in range(3):
        for name, (fn, xa) in variants.items():
            def feedback(a, out):
                return a.at[(0,) * a.ndim].add(out[(0,) * out.ndim])

            jf = jax.jit(fn)
            try:
                t = per_iter_chain(jf, jnp.asarray(xa), feedback, repeats=2)
                results[name].append(t)
            except Exception as e:
                print(f"{name}: FAIL {type(e).__name__}: {str(e)[:120]}",
                      flush=True)
                results[name].append(float("nan"))
    for name, ts in results.items():
        print(f"{name:16s}: {np.nanmin(ts)*1e6:7.1f} us   runs="
              + ",".join(f"{t*1e6:.1f}" for t in ts), flush=True)


if __name__ == "__main__":
    main()
