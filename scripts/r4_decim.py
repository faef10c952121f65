"""Round-4: stride-2 1x1-conv decimation fix (v5e).

The 1x1 s2 conv routes to a matmul after an XLA strided subsample
`x[:, ::2, ::2, :]` — measured PATHOLOGICAL on int8 over the tunnel
(677 us at (8,14,14,1024), ~19% of ResNet-50 b8 e2e; same family as the
112 us strided im2col build).  Candidates, all exact:

  decim_xla    — the current strided slice (anchor)
  decim_selmm  — decimation as TWO selection-matrix MXU contractions
                 (S_h @ X @ S_w^T per channel block): dense dot_generals,
                 zero relayout, values preserved exactly
  decim_bitcast— bitcast int8 -> int32 (4 channels/word), strided slice on
                 int32, bitcast back
  e2e_*        — full 1x1 s2 conv via each decimation + tuned matmul

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_decim.py
"""

import json
import os

import numpy as np

OUT = os.environ.get("R4_OUT", "/tmp/r4/decim.json")
results = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        results = json.load(f)


def rec(name, samples):
    from tachikoma_tpu.utils.timing import median_iqr

    med, iqr = median_iqr(samples)
    results[name] = {"med_us": round(med * 1e6, 2),
                     "iqr_us": round(iqr * 1e6, 2)}
    print(name, json.dumps(results[name]), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def fail(name, e):
    results[name] = {"error": repr(e)[:300]}
    print(name, "FAILED:", repr(e)[:300], flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def _done(n):
    if n in results and "error" not in results[n]:
        print("skip:", n, flush=True)
        return True
    return False


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tachikoma_tpu.utils.timing import per_iter_chain_samples

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def fbsum(a, out):
        return a ^ (out.astype(jnp.int32).sum() & 1).astype(a.dtype)

    for (n, h, w, c) in [(8, 14, 14, 1024), (8, 56, 56, 256),
                         (8, 28, 28, 512)]:
        tag = f"h{h}c{c}"
        x = rng.integers(-127, 128, (n, h, w, c)).astype(np.int8)
        xj = jnp.asarray(x)
        want = x[:, ::2, ::2, :]
        oh, ow = want.shape[1], want.shape[2]

        if not _done(f"decim_xla_{tag}"):
            try:
                f = jax.jit(lambda a: a[:, ::2, ::2, :])
                assert np.array_equal(np.asarray(f(xj)), want)
                rec(f"decim_xla_{tag}",
                    per_iter_chain_samples(f, xj, fbsum, samples=5))
            except Exception as e:  # noqa: BLE001
                fail(f"decim_xla_{tag}", e)

        if not _done(f"decim_selmm_{tag}"):
            try:
                sh = np.zeros((oh, h), np.int8)
                sh[np.arange(oh), np.arange(oh) * 2] = 1
                sw = np.zeros((ow, w), np.int8)
                sw[np.arange(ow), np.arange(ow) * 2] = 1

                def selmm(a):
                    # rows: (oh,h) x (n,h,w,c) over h; cols likewise
                    t = lax.dot_general(
                        jnp.asarray(sh), a, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)  # (oh,n,w,c)
                    t = lax.dot_general(
                        jnp.asarray(sw), t, (((1,), (2,)), ((), ())),
                        preferred_element_type=jnp.int32)  # (ow,oh,n,c)
                    return jnp.transpose(t, (2, 1, 0, 3)).astype(jnp.int8)

                assert np.array_equal(np.asarray(selmm(xj)), want)
                rec(f"decim_selmm_{tag}",
                    per_iter_chain_samples(selmm, xj, fbsum, samples=5))
            except Exception as e:  # noqa: BLE001
                fail(f"decim_selmm_{tag}", e)

        if not _done(f"decim_bitcast_{tag}"):
            try:
                def bc(a):
                    v = lax.bitcast_convert_type(
                        a.reshape(n, h, w, c // 4, 4), jnp.int32)
                    v = v[:, ::2, ::2, :]
                    return lax.bitcast_convert_type(v, jnp.int8).reshape(
                        n, oh, ow, c)

                assert np.array_equal(np.asarray(bc(xj)), want)
                rec(f"decim_bitcast_{tag}",
                    per_iter_chain_samples(bc, xj, fbsum, samples=5))
            except Exception as e:  # noqa: BLE001
                fail(f"decim_bitcast_{tag}", e)

        # reshape-to-phase form: (n,h/2,2,w/2,2,c) slice index 0,0
        if not _done(f"decim_reshape_{tag}"):
            try:
                def rs(a):
                    v = a.reshape(n, oh, 2, ow, 2, c)
                    return lax.slice(
                        v, (0, 0, 0, 0, 0, 0),
                        (n, oh, 1, ow, 1, c)).reshape(n, oh, ow, c)

                assert np.array_equal(np.asarray(rs(xj)), want)
                rec(f"decim_reshape_{tag}",
                    per_iter_chain_samples(rs, xj, fbsum, samples=5))
            except Exception as e:  # noqa: BLE001
                fail(f"decim_reshape_{tag}", e)

    print("DONE", json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
