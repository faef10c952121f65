"""Stage-level e2e ablation of quantized+fused ResNet-50 b8: time the graph
truncated at stage boundaries; differences give honest in-context per-stage
costs (the per-op profiler measures ops in isolation, which XLA fusion and
overlap make unrepresentative — sum-of-parts read 7.9 ms vs 4.4 ms e2e)."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def main():
    import jax
    import jax.numpy as jnp

    from bench_models import build
    from tachikoma_tpu.ir.graph import Graph
    from tachikoma_tpu.runtime.executor import JaxExecutor
    from tachikoma_tpu.utils.timing import per_iter_chain

    print("device:", jax.devices()[0].device_kind, flush=True)
    import os
    fg, x = build(os.environ.get("ABLATE_MODEL", "resnet50"))
    names = [n.name for n in fg.nodes]
    default = [("data_q", "quantize"),
               ("relu0_rq", "stem conv7x7"),
               ("pool0", "maxpool"),
               ("s0b2_out", "stage1(56^2)"),
               ("s1b0_out", "s1 downsample"),
               ("s1b3_out", "stage2(28^2)"),
               ("s2b5_out", "stage3(14^2)"),
               ("s3b2_out", "stage4(7^2)"),
               (fg.outputs[0], "full")]
    markers = ([(m, m) for m in sys.argv[1:]] + [(fg.outputs[0], "full")]
               if len(sys.argv) > 1 else default)
    cuts = []
    for marker, label in markers:
        cand = [nm for nm in names if nm == marker or nm.startswith(marker)]
        if not cand:
            print(f"marker {marker} not found", flush=True)
            continue
        cuts.append((label, cand[0]))

    prev = 0.0
    for label, node in cuts:
        sub = Graph(list(fg.nodes), [node], params=fg.params,
                    name=fg.name).dead_code_eliminate()
        ex = JaxExecutor(sub)
        fn0, params = ex.make_jit_fn()
        vname = sub.inputs[0].name

        def fn(a, _f=fn0, _p=params, _v=vname):
            return _f(_p, {_v: a})[0]

        def feedback(a, out):
            flat0 = out.reshape(-1)[0]
            return a.at[0, 0, 0, 0].add(flat0.astype(a.dtype))

        per = per_iter_chain(fn, jnp.asarray(x), feedback)
        print(f"{label:14s}: cumulative {per*1e3:7.3f} ms   "
              f"stage {(per-prev)*1e3:7.3f} ms", flush=True)
        prev = per


if __name__ == "__main__":
    main()
