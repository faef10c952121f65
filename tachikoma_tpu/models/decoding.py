"""Incremental (KV-cache) decoding for the causal-LM family — the serving
path.

The reference stack has no autoregressive serving story (it is a 2022
inference compiler; its graph executor recomputes the full sequence every
step).  TPU-native serving splits the model into two STATIC-shape programs:

  * the full causal graph (models/transformer.py gpt2) serves as prefill /
    the recompute reference;
  * gpt2_decode_step builds the per-token step graph: one token + position
    scalar + per-layer K/V caches in, next-token logits + updated caches
    out.  Cache writes are `dynamic_update_slice` at the position scalar;
    attention runs over the full cache with an additive position mask, so
    every shape is static and XLA compiles ONE step program reused for
    every token.

Weights are TAKEN FROM the full graph's params (same const names), so
incremental decode and full recompute are the same model by construction —
tests/test_decoding.py asserts token-level agreement.
"""

from __future__ import annotations

import numpy as np

from ..ir.graph import Graph, GraphBuilder
from ..ir.infer import infer_types


def gpt2_decode_step(full: Graph, batch_size=1, max_len=128, hidden=768,
                     layers=12, heads=12, ffn_dim=3072,
                     vocab=50257) -> Graph:
    """Build the single-token decode-step graph sharing `full`'s weights.

    Inputs : token (B,1) int32, pos () int32,
             k0..k{L-1}, v0..v{L-1}  (B,H,max_len,hd) float32
    Outputs: logits (B,vocab), then the updated caches in the same order.
    """
    P = full.params
    hd = hidden // heads
    b = GraphBuilder("gpt2_step")
    token = b.var("token", (batch_size, 1), "int32")
    pos = b.var("pos", (), "int32")
    kc = [b.var(f"k{i}", (batch_size, heads, max_len, hd), "float32")
          for i in range(layers)]
    vc = [b.var(f"v{i}", (batch_size, heads, max_len, hd), "float32")
          for i in range(layers)]

    def const(name):
        return b.const(P[name], name=name)

    def dense(x, prefix, cin, cout):
        y = b.call("nn.dense", x, const(f"{prefix}_w"))
        return b.call("nn.bias_add", y, const(f"{prefix}_b"))

    def layer_norm(x, prefix):
        return b.call("nn.layer_norm", x, const(f"{prefix}_g"),
                      const(f"{prefix}_b"), axis=-1, epsilon=1e-12)

    tok = b.call("take", const("wte"), token, axis=0)        # (B,1,H)
    pe = b.call("take", const("wpe"), pos, axis=0)           # (H,)
    pe = b.call("reshape", pe, newshape=(1, 1, hidden))
    h = b.call("add", tok, pe)

    zero = b.const(np.int32(0))
    # additive mask over cache positions: 0 where j <= pos, -30 beyond
    # (matches the full model's causal mask constant, transformer.py:172)
    ar = b.const(np.arange(max_len, dtype=np.int32), "step_arange")
    keep = b.call("less_equal", ar, pos)                     # (max_len,) bool
    mzero = b.const(np.zeros(max_len, np.float32))
    mneg = b.const(np.full(max_len, -30.0, np.float32))
    maskf = b.call("where", keep, mzero, mneg)               # (max_len,)
    maskf = b.call("reshape", maskf, newshape=(1, 1, 1, max_len))

    new_k, new_v = [], []
    for i in range(layers):
        pfx = f"block{i}"
        ln1 = layer_norm(h, f"{pfx}_ln1")
        q = dense(ln1, f"{pfx}_attn_q", hidden, hidden)
        k = dense(ln1, f"{pfx}_attn_k", hidden, hidden)
        v = dense(ln1, f"{pfx}_attn_v", hidden, hidden)

        def heads1(t):
            t = b.call("reshape", t, newshape=(batch_size, 1, heads, hd))
            return b.call("transpose", t, axes=(0, 2, 1, 3))  # (B,H,1,hd)

        qh, kh, vh = heads1(q), heads1(k), heads1(v)
        kcat = b.call("dynamic_update_slice", kc[i], kh, zero, zero, pos,
                      zero)
        vcat = b.call("dynamic_update_slice", vc[i], vh, zero, zero, pos,
                      zero)
        new_k.append(kcat)
        new_v.append(vcat)
        scores = b.call("nn.batch_matmul", qh, kcat, transpose_b=True)
        scale = b.const(np.float32(1.0 / np.sqrt(hd)))
        scaled = b.call("multiply", scores, scale)           # (B,H,1,L)
        masked = b.call("add", scaled, maskf)
        att = b.call("nn.softmax", masked, axis=-1)
        ctx = b.call("nn.batch_matmul", att, vcat)           # (B,H,1,hd)
        ctx = b.call("transpose", ctx, axes=(0, 2, 1, 3))
        ctx = b.call("reshape", ctx, newshape=(batch_size, 1, hidden))
        att_o = dense(ctx, f"{pfx}_attn_o", hidden, hidden)
        res1 = b.call("add", h, att_o)
        ln2 = layer_norm(res1, f"{pfx}_ln2")
        f1 = dense(ln2, f"{pfx}_ffn1", hidden, ffn_dim)
        act = b.call("nn.gelu", f1)
        f2 = dense(act, f"{pfx}_ffn2", ffn_dim, hidden)
        h = b.call("add", res1, f2)

    h = layer_norm(h, "ln_f")
    logits = b.call("nn.matmul", h, const("lm_head"))        # (B,1,V)
    logits = b.call("reshape", logits, newshape=(batch_size, vocab))
    return infer_types(b.build([logits] + new_k + new_v))


class GreedyDecoder:
    """Greedy autoregressive generation over a decode-step graph.

    Each call to step() is one execution of the SAME compiled program
    (static shapes; the position is a scalar input) — the serving hot loop.
    """

    def __init__(self, step_graph: Graph, layers: int, backend: str = "jax"):
        self.g = step_graph
        self.layers = layers
        self.backend = backend
        if backend == "jax":
            from ..runtime.executor import JaxExecutor

            self._ex = JaxExecutor(step_graph)
        else:
            self._ex = None

    def _run(self, feeds):
        if self._ex is not None:
            return self._ex.run(feeds)
        from ..runtime.interpreter import run_graph

        return run_graph(self.g, feeds)

    def _choose(self, logits: np.ndarray, temperature: float,
                top_k: int | None, rng) -> np.ndarray:
        if temperature <= 0:
            return np.argmax(logits, axis=-1).astype(np.int32)
        z = logits.astype(np.float64) / temperature
        if top_k:
            kth = np.partition(z, -top_k, axis=-1)[:, -top_k][:, None]
            z = np.where(z < kth, -np.inf, z)
        z = z - z.max(axis=-1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=-1, keepdims=True)
        return np.array([rng.choice(p.shape[-1], p=row) for row in p],
                        np.int32)

    def attach_prefill(self, full_graph: Graph):
        """One-pass prefill: run the FULL causal graph on the prompt and
        read the per-layer K/V head tensors out of its intermediate capture
        (transformer.py names them block{i}_attn_{kh,vh}_t) — seeding the
        caches in a single program execution instead of P step calls."""
        from ..runtime.executor import JaxExecutor

        names = []
        for i in range(self.layers):
            names += [f"block{i}_attn_kh_t", f"block{i}_attn_vh_t"]
        missing = [nm for nm in names if nm not in full_graph]
        if missing:
            raise ValueError(f"full graph lacks K/V head nodes: {missing}")
        self._prefill_len = full_graph.inputs[0].shape[1]
        self._prefill = JaxExecutor(full_graph,
                                    capture=[full_graph.outputs[0]] + names)
        return self

    def generate(self, prompt: np.ndarray, n_new: int,
                 temperature: float = 0.0, top_k: int | None = None,
                 seed: int = 0):
        """prompt (B, P) int32 -> (tokens (B, n_new) int32, logits list).

        temperature=0 is greedy; otherwise top-k/temperature sampling with
        a seeded host rng (deterministic serving)."""
        rng = np.random.default_rng(seed)
        bsz = prompt.shape[0]
        kv = self.g.inputs
        cache_shapes = {n.name: n.shape for n in kv
                        if n.name[0] in "kv" and n.name[1:].isdigit()}
        caches = {nm: np.zeros(sh, np.float32)
                  for nm, sh in cache_shapes.items()}
        logits = None
        step_logits = []
        P = prompt.shape[1]
        if getattr(self, "_prefill", None) is not None:
            # single-pass prefill through the full graph (right-padded;
            # causal masking makes the padding positions irrelevant)
            padded = np.zeros((bsz, self._prefill_len), np.int32)
            padded[:, :P] = prompt
            outs = self._prefill.run({self._prefill.graph.inputs[0].name:
                                      padded})
            full_logits = np.asarray(outs[0])
            for i in range(self.layers):
                kh = np.asarray(outs[1 + 2 * i])       # (B,H,S,hd)
                vh = np.asarray(outs[2 + 2 * i])
                L = caches[f"k{i}"].shape[2]
                caches[f"k{i}"][:, :, :min(P, L), :] = kh[:, :, :P][:, :, :L]
                caches[f"v{i}"][:, :, :min(P, L), :] = vh[:, :, :P][:, :, :L]
            for p in range(P):
                step_logits.append(full_logits[:, p, :])
            logits = full_logits[:, P - 1, :]
        else:
            # prefill token-by-token through the same step program
            for p in range(P):
                feeds = {"token": prompt[:, p:p + 1], "pos": np.int32(p),
                         **caches}
                outs = self._run(feeds)
                logits = np.asarray(outs[0])
                for i in range(self.layers):
                    caches[f"k{i}"] = np.asarray(outs[1 + i])
                    caches[f"v{i}"] = np.asarray(outs[1 + self.layers + i])
                step_logits.append(logits)
        toks = []
        cur = self._choose(logits, temperature, top_k, rng).reshape(bsz, 1)
        for s in range(n_new):
            toks.append(cur.copy())
            if s == n_new - 1:
                break
            feeds = {"token": cur, "pos": np.int32(P + s), **caches}
            outs = self._run(feeds)
            logits = np.asarray(outs[0])
            for i in range(self.layers):
                caches[f"k{i}"] = np.asarray(outs[1 + i])
                caches[f"v{i}"] = np.asarray(outs[1 + self.layers + i])
            step_logits.append(logits)
            cur = self._choose(logits, temperature, top_k,
                               rng).reshape(bsz, 1)
        return np.concatenate(toks, axis=1), step_logits

    def generate_ondevice(self, prompt: np.ndarray, n_new: int,
                          temperature: float = 0.0, top_k: int | None = None,
                          seed: int = 0) -> np.ndarray:
        """The whole decode loop as ONE device program: lax.scan over steps
        with the caches as carry and sampling on-device.

        The host-loop `generate` dispatches (and fetches) every step —
        correct, but each token costs multiple serialized host round trips;
        on a remote/tunneled device that RTT dominates by 20x+.  Here the
        device runs all `n_new` steps autonomously and the host fetches one
        (B, n_new) token array at the end.

        Greedy (temperature=0) matches `generate` token-for-token
        (tests/test_decoding.py); sampling uses a seeded jax PRNG
        (deterministic, but a different stream than the host rng).
        Returns tokens (B, n_new) int32."""
        import jax
        import jax.numpy as jnp
        from jax import lax

        if self._ex is None:
            raise ValueError("generate_ondevice requires the jax backend")
        fn0, params = self._ex.make_jit_fn()
        bsz, P = prompt.shape
        L = self.layers
        cache_shapes = {n.name: n.shape for n in self.g.inputs
                        if n.name[0] in "kv" and n.name[1:].isdigit()}
        caches = {nm: np.zeros(sh, np.float32)
                  for nm, sh in cache_shapes.items()}
        if getattr(self, "_prefill", None) is None:
            raise ValueError("attach_prefill(...) first: on-device decode "
                             "seeds the caches in one prefill pass")
        # validate up front: a prompt longer than the attached prefill (or
        # the cache) would silently truncate the seeded cache and then die
        # in an opaque numpy broadcast error below
        min_cache = min(sh[2] for sh in cache_shapes.values()) \
            if cache_shapes else 0
        if P > self._prefill_len or P > min_cache:
            raise ValueError(
                f"prompt length {P} exceeds the attached prefill length "
                f"({self._prefill_len}) or KV-cache length ({min_cache}); "
                f"re-attach a prefill built for at least {P} positions")
        padded = np.zeros((bsz, self._prefill_len), np.int32)
        padded[:, :P] = prompt
        outs = self._prefill.run_device(
            {self._prefill.graph.inputs[0].name: padded})
        for i in range(L):
            Lc = caches[f"k{i}"].shape[2]
            p_eff = min(P, Lc)
            caches[f"k{i}"][:, :, :p_eff, :] = np.asarray(
                outs[1 + 2 * i])[:, :, :p_eff, :]
            caches[f"v{i}"][:, :, :p_eff, :] = np.asarray(
                outs[2 + 2 * i])[:, :, :p_eff, :]
        logits0 = jnp.asarray(outs[0])[:, P - 1, :]

        def choose(logits, key):
            if temperature <= 0:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            z = logits.astype(jnp.float32) / jnp.float32(temperature)
            if top_k:
                kth = jax.lax.top_k(z, top_k)[0][:, -1:]
                z = jnp.where(z < kth, -jnp.inf, z)
            return jax.random.categorical(key, z, axis=-1).astype(jnp.int32)

        cnames = sorted(caches)

        def body(carry, s):
            cvals, cur, key = carry
            key, sub = jax.random.split(key)
            feeds = dict(zip(cnames, cvals))
            feeds["token"] = cur
            feeds["pos"] = (jnp.int32(P) + s).astype(jnp.int32)
            outs = fn0(params, feeds)
            logits = outs[0]
            byname = {f"k{i}": outs[1 + i] for i in range(L)}
            byname.update({f"v{i}": outs[1 + L + i] for i in range(L)})
            nxt = choose(logits, sub).reshape(bsz, 1)
            return (tuple(byname[nm] for nm in cnames), nxt, key), cur

        @jax.jit
        def run(params, cvals, logits0, key):
            key, sub = jax.random.split(key)
            cur = choose(logits0, sub).reshape(bsz, 1)
            (_, _, _), toks = lax.scan(
                body, (cvals, cur, key), jnp.arange(n_new, dtype=jnp.int32),
                length=n_new)
            return jnp.swapaxes(toks[:, :, 0], 0, 1)  # (B, n_new)

        key = jax.random.PRNGKey(seed)
        cvals = tuple(jnp.asarray(caches[nm]) for nm in cnames)
        return np.asarray(run(params, cvals, logits0, key)).astype(np.int32)


def gpt2_generate_scanned(full: Graph, prompt: np.ndarray, n_new: int, *,
                          max_len=128, hidden=768, layers=12, heads=12,
                          ffn_dim=3072, vocab=50257, temperature: float = 0.0,
                          top_k: int | None = None, seed: int = 0):
    """O(1)-program on-device generation: prefill AND decode as ONE jitted
    program whose transformer body is a lax.scan over STACKED layer weights
    (program size = one layer, not `layers` — the unrolled step graph
    exceeds remote-compile request caps exactly like the unrolled full
    graph did; runtime/segmented.py solves this for inference graphs, this
    is the decoding counterpart).

    The outer scan runs P + n_new single-token steps (teacher-forced over
    the prompt, then sampling); the inner scan runs the layers with the
    per-layer KV caches as scanned-over/updated xs/ys.  Layer math mirrors
    gpt2_decode_step op for op, so greedy tokens match GreedyDecoder's
    host loop (tests/test_decoding.py).

    Returns tokens (B, n_new) int32."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    P_ = full.params
    hd = hidden // heads
    bsz, plen = prompt.shape
    assert plen + n_new <= max_len + 1, "prompt + generation exceeds max_len"

    # one compiled program per (geometry, sampling) config, cached on the
    # graph: rebuilding the jitted closure per call would re-trace (and
    # re-upload the compile request) every generation
    # params identity token: the stacked device weights are cached on the
    # graph, so a REPLACED param array after the first call must invalidate
    # the entry.  The cache entry keeps STRONG references to the keyed
    # arrays (below) so a freed-and-reallocated buffer can never reuse a
    # cached id (in-place mutation of an existing ndarray is still on the
    # caller: freeze params after first use)
    params_token = tuple(sorted(id(v) for v in P_.values()))
    ckey = (bsz, plen, n_new, max_len, hidden, layers, heads, ffn_dim,
            vocab, float(temperature), top_k, params_token)
    cache = getattr(full, "_scan_gen_cache", None)
    if cache is None:
        cache = {}
        try:
            full._scan_gen_cache = cache
        except AttributeError:
            pass
    if ckey in cache:
        run, stacked_j, tops_j, _pinned = cache[ckey]
        key = jax.random.PRNGKey(seed)
        out = run(stacked_j, tops_j, jnp.asarray(prompt.astype(np.int32)),
                  key)
        return np.asarray(out).astype(np.int32)

    def stack(fmt):
        return np.stack([P_[fmt.format(i)] for i in range(layers)])

    stacked = {
        "ln1_g": stack("block{}_ln1_g"), "ln1_b": stack("block{}_ln1_b"),
        "ln2_g": stack("block{}_ln2_g"), "ln2_b": stack("block{}_ln2_b"),
        "q_w": stack("block{}_attn_q_w"), "q_b": stack("block{}_attn_q_b"),
        "k_w": stack("block{}_attn_k_w"), "k_b": stack("block{}_attn_k_b"),
        "v_w": stack("block{}_attn_v_w"), "v_b": stack("block{}_attn_v_b"),
        "o_w": stack("block{}_attn_o_w"), "o_b": stack("block{}_attn_o_b"),
        "f1_w": stack("block{}_ffn1_w"), "f1_b": stack("block{}_ffn1_b"),
        "f2_w": stack("block{}_ffn2_w"), "f2_b": stack("block{}_ffn2_b"),
    }
    tops = {k: P_[k] for k in ("wte", "wpe", "ln_f_g", "ln_f_b", "lm_head")}

    def ln(x, g, b):
        x = x.astype(jnp.float32)
        mu = x.mean(axis=-1, keepdims=True)
        var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + jnp.float32(1e-12)) * g + b

    def layer_step(h, xs, pos, maskf):
        w, kc, vc = xs
        ln1 = ln(h, w["ln1_g"], w["ln1_b"])
        q = jnp.matmul(ln1, w["q_w"]) + w["q_b"]
        k = jnp.matmul(ln1, w["k_w"]) + w["k_b"]
        v = jnp.matmul(ln1, w["v_w"]) + w["v_b"]

        def heads1(t):
            return jnp.transpose(t.reshape(bsz, 1, heads, hd), (0, 2, 1, 3))

        qh, kh, vh = heads1(q), heads1(k), heads1(v)
        z = jnp.int32(0)
        kcat = lax.dynamic_update_slice(kc, kh, (z, z, pos, z))
        vcat = lax.dynamic_update_slice(vc, vh, (z, z, pos, z))
        scores = jnp.matmul(qh, jnp.swapaxes(kcat, -1, -2),
                            preferred_element_type=jnp.float32)
        scaled = scores * jnp.float32(1.0 / np.sqrt(hd))
        att = jax.nn.softmax(scaled + maskf, axis=-1)
        ctx = jnp.matmul(att, vcat, preferred_element_type=jnp.float32)
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(bsz, 1, hidden)
        res1 = h + (jnp.matmul(ctx, w["o_w"]) + w["o_b"])
        ln2 = ln(res1, w["ln2_g"], w["ln2_b"])
        f1 = jnp.matmul(ln2, w["f1_w"]) + w["f1_b"]
        act = jax.nn.gelu(f1.astype(jnp.float32), approximate=False)
        h2 = res1 + (jnp.matmul(act, w["f2_w"]) + w["f2_b"])
        return h2, kcat, vcat

    def choose(logits, key):
        if temperature <= 0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        z = logits.astype(jnp.float32) / jnp.float32(temperature)
        if top_k:
            kth = lax.top_k(z, top_k)[0][:, -1:]
            z = jnp.where(z < kth, -jnp.inf, z)
        return jax.random.categorical(key, z, axis=-1).astype(jnp.int32)

    ar = jnp.arange(max_len, dtype=jnp.int32)

    @jax.jit
    def run(stk, top, prm, key):
        def token_step(carry, s):
            kc, vc, cur, key = carry
            key, sub = jax.random.split(key)
            tok = jnp.where(s < plen, prm[:, jnp.minimum(s, plen - 1)],
                            cur)                           # (B,)
            pe = jnp.take(top["wpe"], s, axis=0).reshape(1, 1, hidden)
            h = jnp.take(top["wte"], tok[:, None], axis=0) + pe
            maskf = jnp.where(ar <= s, jnp.float32(0),
                              jnp.float32(-30)).reshape(1, 1, 1, max_len)

            def body(hc, xs):
                w, kcl, vcl = xs
                h2, kn, vn = layer_step(hc, (w, kcl, vcl), s, maskf)
                return h2, (kn, vn)

            h, (kc, vc) = lax.scan(body, h, (stk, kc, vc))
            hf = ln(h, top["ln_f_g"], top["ln_f_b"])
            logits = jnp.matmul(hf, top["lm_head"]).reshape(bsz, vocab)
            nxt = choose(logits, sub)
            return (kc, vc, nxt, key), nxt

        kc = jnp.zeros((layers, bsz, heads, max_len, hd), jnp.float32)
        vc = jnp.zeros_like(kc)
        cur = jnp.zeros((bsz,), jnp.int32)
        steps = jnp.arange(plen + n_new - 1, dtype=jnp.int32)
        (_, _, _, _), toks = lax.scan(token_step, (kc, vc, cur, key), steps)
        return jnp.swapaxes(toks[plen - 1:], 0, 1)  # (B, n_new)

    stacked_j = {k: jnp.asarray(v) for k, v in stacked.items()}
    tops_j = {k: jnp.asarray(v) for k, v in tops.items()}
    # pin the keyed host arrays: their ids stay valid while cached
    cache[ckey] = (run, stacked_j, tops_j, list(P_.values()))
    key = jax.random.PRNGKey(seed)
    out = run(stacked_j, tops_j, jnp.asarray(prompt.astype(np.int32)), key)
    return np.asarray(out).astype(np.int32)
