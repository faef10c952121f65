"""Flash attention: blockwise online-softmax kernel + graph fusion.

The float twin of the integer attention path (SURVEY §5.7 blockwise
attention obligation): kernel vs naive reference, fusion pass on the zoo's
BERT/GPT-2 graphs, whole-graph output parity."""

import numpy as np
import pytest

from tachikoma_tpu import infer_types, run_graph
from tachikoma_tpu.ir.transforms import fuse_attention
from tachikoma_tpu.models.transformer import bert, gpt2
from tachikoma_tpu.ops.pallas.flash_attention import flash_attention
from tachikoma_tpu.runtime.executor import JaxExecutor


def _ref(q, k, v, scale, causal):
    s = np.einsum("bhqd,bhkd->bhqk", q, k).astype(np.float64) * scale
    if causal:
        S = q.shape[2]
        s = np.where(np.triu(np.ones((S, S), bool), 1), -1e30, s)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v.astype(np.float64))


@pytest.mark.parametrize("B,H,S,D,causal", [
    (2, 2, 128, 64, False),
    (1, 3, 256, 64, True),
    (2, 2, 200, 128, False),   # S not a block multiple: padded-key masking
    (1, 2, 130, 64, True),
])
def test_flash_kernel_matches_reference(rng, B, H, S, D, causal):
    import jax.numpy as jnp

    q = rng.standard_normal((B, H, S, D)).astype(np.float32)
    k = rng.standard_normal((B, H, S, D)).astype(np.float32)
    v = rng.standard_normal((B, H, S, D)).astype(np.float32)
    got = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), causal=causal))
    want = _ref(q, k, v, 1 / np.sqrt(D), causal)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_fuse_attention_bert(rng):
    g = bert(batch_size=2, seq_len=32, hidden=64, layers=2, heads=4,
             ffn_dim=128, vocab=100, seed=0)
    fg = fuse_attention(g)
    n_attn = sum(1 for n in fg.nodes if n.op == "tk.attention")
    assert n_attn == 2, n_attn
    assert not any(n.op == "nn.softmax" and "attn" in n.name
                   for n in fg.nodes)
    x = rng.integers(0, 100, (2, 32)).astype(np.int32)
    a = run_graph(g, x)[0]
    c = run_graph(fg, x)[0]
    np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)
    j = JaxExecutor(fg).run(x)[0]
    np.testing.assert_allclose(a, j, rtol=1e-4, atol=1e-5)


def test_fuse_attention_gpt2_causal(rng):
    g = gpt2(batch_size=1, seq_len=32, hidden=64, layers=2, heads=4,
             ffn_dim=128, vocab=80, seed=1)
    fg = fuse_attention(g)
    attn = [n for n in fg.nodes if n.op == "tk.attention"]
    assert len(attn) == 2 and all(n.attrs["causal"] for n in attn)
    x = rng.integers(0, 80, (1, 32)).astype(np.int32)
    a = run_graph(g, x)[0]
    c = run_graph(fg, x)[0]
    # -30 additive mask vs hard causal: difference bounded by exp(-30)
    np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)
