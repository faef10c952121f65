"""ResNet stem (7x7 s2, 3ch) experiments: the single hottest ResNet-50 op
(ablation: 1.36 ms of 4.8 ms e2e; the tuned im2col matmul alone is 152 us).

The waste is structural: polyphase stacking gives cin_s = 4 phases x 3 = 12
channels, which the VMEM kernel pads to 128 lanes (10.7x wasted MACs) and
the XLA im2col concatenates as 16 pieces of 12-lane tensors (relayout
storm).  Candidates: channel-pad BEFORE im2col so pieces are 16/32-lane
aligned and K stays a sane contraction (256 / 512).

Times (interleaved, min of 3 rounds) + exactness vs the production path.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_stem.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from tachikoma_tpu.ops.pallas.conv_flat import (_conv_im2col,
                                                    _phase_stack,
                                                    _phase_weights,
                                                    qconv2d_flat)
    from tachikoma_tpu.ops.pallas.matmul_int8 import qmatmul_int8
    from tachikoma_tpu.ops.pallas.qms32 import plan_requantize
    from tachikoma_tpu.utils.timing import per_iter_chain

    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    n, h, w, cin, cout, k, s = 8, 224, 224, 3, 64, 7, 2
    x = rng.integers(-127, 127, (n, h, w, cin)).astype(np.int8)
    wt = rng.integers(-127, 127, (k, k, cin, cout)).astype(np.int8)
    bias = rng.integers(-500, 500, (cout,)).astype(np.int32)
    m, sh_ = plan_requantize(0.0004, 0.05)
    macs = n * (h // 2) * (w // 2) * cout * k * k * cin
    pad = (3, 3, 3, 3)

    def prod(a):
        return qconv2d_flat(a, wt, bias=bias, multiplier=m, shift=sh_,
                            strides=(2, 2), padding=pad)

    ref = np.asarray(jax.jit(prod)(jnp.asarray(x)))

    def im2col_padded(cpad):
        """Channel-pad before phase stack: pieces become 4*cpad-lane."""
        def fn(a):
            ap = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, cpad - cin)))
            wp = jnp.pad(jnp.asarray(wt),
                         ((0, 0), (0, 0), (0, cpad - cin), (0, 0)))
            xs, (oh, ow, khp, kwp, hph, wph) = _phase_stack(
                ap, k, k, s, s, pad, 0)
            wps = _phase_weights(wp, s, s)
            m_arr = np.broadcast_to(np.asarray(m, np.int32), (cout,))
            s_arr = np.broadcast_to(np.asarray(sh_, np.int32), (cout,))
            return _conv_im2col(
                xs, wps, jnp.asarray(bias), m_arr, s_arr, n, oh, ow,
                khp, kwp, hph, wph, xs.shape[-1], cout, 0,
                "UPWARD", "int8", -128, 127, True)

        return fn

    def xla_f32(a):
        """XLA f32 conv with EXACT integer semantics: every product is an
        integer <= 127*127 and the 147-term dot stays < 2^24, so f32
        accumulation is exact; XLA:TPU's conv emitter handles cin=3 stems
        with its own space-to-depth.  Epilogue = the exact fixed-point
        requantize on the recovered int32 accumulator."""
        from jax import lax

        from tachikoma_tpu.ops.fixed_point import requantize_jnp

        acc = lax.conv_general_dilated(
            a.astype(jnp.float32), jnp.asarray(wt, jnp.float32),
            window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        acc = acc.astype(jnp.int32) + jnp.asarray(bias, jnp.int32)
        return requantize_jnp(acc, 0.0004, 0, 0.05, 0, rounding="UPWARD",
                              out_dtype="int8")

    try:
        got = np.asarray(jax.jit(xla_f32)(jnp.asarray(x)))
        print("xla f32 conv:", "EXACT" if np.array_equal(got, ref)
              else "MISMATCH!!", flush=True)
        xla_ok = np.array_equal(got, ref)
    except Exception as e:
        print(f"xla f32 conv: FAIL {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        xla_ok = False

    variants = {"production": prod}
    if xla_ok:
        variants["xla f32 conv"] = xla_f32
    for cpad in (3, 4, 8):
        f = im2col_padded(cpad)
        try:
            got = np.asarray(jax.jit(f)(jnp.asarray(x)))
            tag = "EXACT" if np.array_equal(got, ref) else "MISMATCH!!"
            print(f"im2col cpad={cpad}: {tag}", flush=True)
            if tag == "EXACT":
                variants[f"im2col cpad={cpad}"] = f
        except Exception as e:
            print(f"im2col cpad={cpad}: FAIL {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)

    # pipeline pieces (timing only): phase stack alone; patch+matmul via
    # pre-stacked input
    def stack_only(a):
        xs, _ = _phase_stack(a, k, k, s, s, pad, 0)
        return xs

    variants["phase-stack only"] = stack_only

    results = {kk: [] for kk in variants}
    for rnd in range(3):
        for name, fn in variants.items():
            def feedback(a, out):
                return a.at[0, 0, 0, 0].add(out[0, 0, 0, 0].astype(jnp.int8))

            try:
                t = per_iter_chain(jax.jit(fn), jnp.asarray(x), feedback,
                                   repeats=2)
                results[name].append(t)
            except Exception as e:
                print(f"{name}: FAIL {type(e).__name__}: {str(e)[:120]}",
                      flush=True)
                results[name].append(float("nan"))
    for name, ts in results.items():
        best = np.nanmin(ts)
        tp = 2 * macs / best / 1e12
        print(f"{name:20s}: {best*1e6:8.1f} us  {tp:5.1f} TOPS useful  "
              f"runs=" + ",".join(f"{t*1e6:.0f}" for t in ts), flush=True)


if __name__ == "__main__":
    main()
