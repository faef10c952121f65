"""Signature-deduped per-op chain profiler on the real chip.

Groups the fused graph's ops by (op, input shapes/dtypes, attrs), measures
ONE representative per signature with the chain-fetch protocol, and reports
estimated totals (time x count).  ~25 signatures for ResNet-50 instead of
232 op dispatch-timings that the tunnel RTT would swamp.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_model.py resnet50
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tachikoma_tpu.ir.graph import CONST, TUPLE, TUPLE_GET_ITEM, VAR
    from tachikoma_tpu.ir.registry import get_op
    import tachikoma_tpu.ops.jax_ops  # noqa: F401 (registers jax impls)
    from tachikoma_tpu.runtime.executor import JaxExecutor, computational_nodes
    from tachikoma_tpu.utils.timing import per_iter_chain

    sys.path.insert(0, "/root/repo/scripts")
    from bench_models import build

    cache = "/tmp/tk_jaxcache"
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    name = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    fg, x = build(name)
    print(f"{name}: {len(fg.nodes)} nodes", flush=True)

    # synthesize op inputs from the inferred types — timing needs shapes,
    # not real values (and the 232-output capture program compiles forever
    # over the tunnel)
    rng = np.random.default_rng(0)
    env = {}
    for n in fg.nodes:
        if n.op in (TUPLE, TUPLE_GET_ITEM):
            env[n.name] = None
            continue
        if n.shape is None or n.dtype in (None, "tuple"):
            env[n.name] = None
            continue
        dt_ = np.dtype(n.dtype)
        if dt_.kind in "iu":
            lo = max(np.iinfo(dt_).min, -100)
            hi = min(np.iinfo(dt_).max, 100)
            arr = rng.integers(lo, hi + 1, n.shape).astype(dt_)
        else:
            arr = rng.standard_normal(n.shape).astype(dt_)
        if n.op == CONST:
            arr = np.asarray(fg.params[n.name])
        env[n.name] = jax.device_put(arr)

    sigs = {}
    for n in fg.nodes:
        if n.op in (VAR, CONST, TUPLE, TUPLE_GET_ITEM):
            continue
        shapes = tuple((tuple(np.shape(env[i])), str(env[i].dtype)) for i in n.inputs)
        key = (n.op, shapes, json.dumps(dict(n.attrs), sort_keys=True, default=str))
        sigs.setdefault(key, []).append(n)

    print(f"{len(sigs)} distinct op signatures", flush=True)
    rows = []
    for (op, shapes, _), nodes in sorted(sigs.items(), key=lambda kv: -len(kv[1])):
        n = nodes[0]
        impl = get_op(n.op).jax_impl
        args = [env[i] for i in n.inputs]
        if any(a is None for a in args):
            continue
        x0 = args[0]

        def fn(a, _args=args, _impl=impl, _n=n):
            r = _impl(a, *_args[1:], node=_n)
            return r[0] if isinstance(r, (list, tuple)) else r

        def fb(a, out):
            s = out.astype(jnp.float32).sum() if out.dtype.kind == "f" else out.astype(jnp.int32).sum().astype(jnp.float32)
            if a.dtype.kind == "f":
                return a + s * jnp.float32(1e-30)
            return a ^ (s.astype(jnp.int32) & 1).astype(a.dtype)

        try:
            t = per_iter_chain(fn, x0, fb, scan_len=32, repeats=2)
        except Exception as e:
            import traceback; traceback.print_exc()
            print(f"  {op} {shapes[0][0]}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        rows.append((t * len(nodes), t, len(nodes), op, shapes[0][0], n.name))
        print(f"  {op:22s} {str(shapes[0][0]):24s} x{len(nodes):2d}  "
              f"{t*1e6:8.1f} us  total {t*len(nodes)*1e3:6.2f} ms", flush=True)

    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"\nsum-of-parts: {total*1e3:.2f} ms (whole-graph measured separately)")
    print("top costs:")
    for tot, t, cnt, op, shape, nm in rows[:12]:
        print(f"  {tot*1e3:6.2f} ms  {op:22s} {str(shape):24s} x{cnt} ({nm})")


if __name__ == "__main__":
    main()
