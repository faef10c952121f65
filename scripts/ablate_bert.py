"""Layer/phase-level e2e ablation of quantized+fused BERT-base b4 s128:
cumulative latency at graph cut points (in-context truth; the isolated
per-op profiler mispredicts)."""
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
    fg, x = build("bert")
    names = {n.name for n in fg.nodes}

    def pick(*cands):
        for c in cands:
            hits = [nm for nm in names if nm == c or nm.startswith(c)]
            if hits:
                return sorted(hits)[0]
        return None

    cuts = [("embeddings", pick("embed_ln")),
            ("l0 qkv", pick("layer0_attn_q_biased", "layer0_attn_q")),
            ("l0 scores", pick("layer0_attn_scaled", "layer0_attn_scores")),
            ("l0 softmax", pick("layer0_attn_softmax")),
            ("l0 ctx+out", pick("layer0_attn_o_biased", "layer0_attn_o")),
            ("l0 ln1", pick("layer0_ln1")),
            ("l0 ffn1", pick("layer0_ffn1_biased", "layer0_ffn1")),
            ("l0 ffn-act", pick("layer0_act")),
            ("l0 done", pick("layer0_ln2")),
            ("l3 done", pick("layer3_ln2")),
            ("l7 done", pick("layer7_ln2")),
            ("l11 done", pick("layer11_ln2")),
            ("full", fg.outputs[0])]

    prev = 0.0
    for label, node in cuts:
        if node is None:
            print(f"{label:12s}: marker missing", flush=True)
            continue
        sub = Graph(list(fg.nodes), [node], params=fg.params,
                    name=fg.name).dead_code_eliminate()
        ex = JaxExecutor(sub)
        fn0, params = ex.make_jit_fn()
        vname = sub.inputs[0].name

        def fn(a, _f=fn0, _p=params, _v=vname):
            return _f(_p, {_v: a})[0]

        def feedback(a, out):
            bump = (out.astype(jnp.float32).reshape(-1)[0]
                    > jnp.float32(1e30)).astype(a.dtype)
            return a + bump

        per = per_iter_chain(fn, jnp.asarray(x), feedback, scan_len=16)
        print(f"{label:12s}: cumulative {per*1e3:7.3f} ms   "
              f"delta {(per-prev)*1e3:7.3f} ms", flush=True)
        prev = per


if __name__ == "__main__":
    main()
