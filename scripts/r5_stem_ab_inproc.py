"""Interleaved IN-PROCESS stem-route A/B (f32 conv-emitter vs s2d+im2col+
Pallas matmul) — the separate-process A/B readings disagreed across the
tunnel band (MobileNet b8 read 2x BOTH directions in adjacent runs), so
this builds each model once, traces BOTH routes, and alternates timing
samples A/B/A/B within one process.  Usage:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_stem_ab_inproc.py mobilenet resnet50

Writes /tmp/r5/stem_ab_inproc.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
OUT = "/tmp/r5/stem_ab_inproc.json"
os.makedirs("/tmp/r5", exist_ok=True)
res = {}


def main():
    import jax
    import jax.numpy as jnp

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/tk_jaxcache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], flush=True)

    from tachikoma_tpu.models.vision import mobilenet_v2, resnet
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.runtime.executor import JaxExecutor
    from tachikoma_tpu.runtime.fuse import fuse_qnn
    from tachikoma_tpu.utils.timing import median_iqr, per_iter_chain

    rng = np.random.default_rng(0)

    def feedback(a, out):
        return a + out.astype(jnp.float32).sum() * jnp.float32(1e-30)

    for name in (sys.argv[1:] or ["mobilenet"]):
        bs = 8
        if "_b" in name:
            name, b = name.rsplit("_b", 1)
            bs = int(b)
        g = (mobilenet_v2(batch_size=bs, image_size=224) if name == "mobilenet"
             else resnet(50, batch_size=bs, image_size=224))
        x = rng.standard_normal((bs, 224, 224, 3)).astype(np.float32)
        qg = quantize(g, [x])
        fg = fuse_qnn(qg)
        xin = jax.device_put(x)

        fns = {}
        for route in ("f32", "im2col"):
            ex = JaxExecutor(fg)
            fn0, params = ex.make_jit_fn()
            vname = fg.inputs[0].name

            # bench_models.py dispatch form: params stay HOST-side (the
            # stem/flat routes build weight layouts host-side by design);
            # per_iter_chain jit-scans the closure.  The env var is read
            # at TRACE time, so the closure sets it on every call — each
            # fn traces (and re-traces inside per_iter_chain's scan)
            # under ITS route regardless of call order.
            def fn(a, fn0=fn0, params=params, route=route):
                os.environ["TK_STEM_ROUTE"] = route
                return fn0(params, {vname: a})[0]

            np.asarray(fn(xin))  # warm the eager path under this route
            fns[route] = fn
        # sanity: both routes produce the same logits (integer-exact graph)
        a0 = np.asarray(fns["f32"](xin))
        a1 = np.asarray(fns["im2col"](xin))
        same = bool((a0 == a1).all())
        print(f"{name}_b{bs}: routes bit-equal = {same}", flush=True)

        samples = {"f32": [], "im2col": []}
        for rep in range(5):
            for route in ("f32", "im2col") if rep % 2 == 0 else \
                    ("im2col", "f32"):
                per = per_iter_chain(fns[route], xin, feedback, scan_len=8,
                                     repeats=1)
                samples[route].append(per)
        out = {"bit_equal": same}
        for route, xs in samples.items():
            med, iqr = median_iqr(xs)
            out[route + "_ms"] = round(med * 1e3, 3)
            out[route + "_iqr_ms"] = round(iqr * 1e3, 3)
        res[f"{name}_b{bs}"] = out
        print(name, bs, out, flush=True)
        with open(OUT, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
