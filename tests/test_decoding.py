"""Incremental KV-cache decoding == full-sequence recompute.

The decode-step graph shares the full model's params by name; greedy
generation through the cached step program must match logits (and chosen
tokens) of the full causal graph evaluated on the final sequence."""

import numpy as np
import pytest

from tachikoma_tpu.models.decoding import GreedyDecoder, gpt2_decode_step
from tachikoma_tpu.models.transformer import gpt2
from tachikoma_tpu.runtime.executor import JaxExecutor

B, L, HID, LAYERS, HEADS, FFN, VOCAB = 2, 12, 32, 2, 4, 64, 50


@pytest.fixture(scope="module")
def model():
    full = gpt2(batch_size=B, seq_len=L, hidden=HID, layers=LAYERS,
                heads=HEADS, ffn_dim=FFN, vocab=VOCAB, seed=7)
    step = gpt2_decode_step(full, batch_size=B, max_len=L, hidden=HID,
                            layers=LAYERS, heads=HEADS, ffn_dim=FFN,
                            vocab=VOCAB)
    return full, step


def test_step_graph_shares_params(model):
    full, step = model
    shared = [k for k in step.params
              if k.startswith(("block", "wte", "wpe", "ln_f", "lm_head"))]
    assert "block0_attn_q_w" in shared and "lm_head" in shared
    for k in shared:
        np.testing.assert_array_equal(step.params[k], full.params[k])


def test_incremental_matches_full_recompute(model, rng):
    full, step = model
    prompt = rng.integers(0, VOCAB, (B, 4)).astype(np.int32)
    n_new = 5
    dec = GreedyDecoder(step, layers=LAYERS)
    toks, step_logits = dec.generate(prompt, n_new)
    assert toks.shape == (B, n_new)

    # reference: run the FULL causal model on the final padded sequence;
    # position p logits depend only on ids[:, :p+1] (causal mask), so the
    # right padding is irrelevant
    seq = np.zeros((B, L), np.int32)
    seq[:, :4] = prompt
    seq[:, 4:4 + n_new] = toks
    ex = JaxExecutor(full)
    full_logits = np.asarray(ex.run({"input_ids": seq})[0])  # (B, L, V)

    # step s consumed position 4+s-1... compare every decode position:
    # step_logits[p] corresponds to logits at sequence position p
    for p in range(4 + n_new - 1):
        np.testing.assert_allclose(
            step_logits[p], full_logits[:, p, :], rtol=2e-4, atol=2e-4,
            err_msg=f"position {p}")
    # greedy choices agree exactly
    for s in range(n_new):
        want = np.argmax(full_logits[:, 4 + s - 1, :], axis=-1)
        np.testing.assert_array_equal(toks[:, s], want, err_msg=f"tok {s}")


def test_oracle_backend_agrees(model, rng):
    full, step = model
    prompt = rng.integers(0, VOCAB, (B, 3)).astype(np.int32)
    jx = GreedyDecoder(step, layers=LAYERS, backend="jax")
    np_ = GreedyDecoder(step, layers=LAYERS, backend="numpy")
    tj, _ = jx.generate(prompt, 3)
    tn, _ = np_.generate(prompt, 3)
    np.testing.assert_array_equal(tj, tn)


def test_quantized_decode_step(model, rng):
    """The decode-step graph quantizes like any other graph (cache
    plumbing falls back to float; matmul/dense/softmax go integer), and
    int8 greedy decoding agrees with the quantized full model's argmax."""
    from tachikoma_tpu.quantize.config import TRANSFORMER_INT8
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.runtime.interpreter import run_graph

    full, step = model
    prompt = rng.integers(0, VOCAB, (B, 6)).astype(np.int32)
    caches = {f"{kv}{i}": np.zeros((B, HEADS, L, HID // HEADS), np.float32)
              for kv in "kv" for i in range(LAYERS)}
    calib = []
    for p in range(4):
        feeds = {"token": prompt[:, p:p + 1], "pos": np.int32(p), **caches}
        calib.append(dict(feeds))
        outs = run_graph(step, feeds)
        for i in range(LAYERS):
            caches[f"k{i}"] = np.asarray(outs[1 + i])
            caches[f"v{i}"] = np.asarray(outs[1 + LAYERS + i])
    qstep = quantize(step, calib, config=TRANSFORMER_INT8)
    dec = GreedyDecoder(qstep, layers=LAYERS)
    toks, _ = dec.generate(prompt, 3)
    assert toks.shape == (B, 3)

    padded = np.pad(prompt, ((0, 0), (0, L - 6)))
    qfull = quantize(full, [{"input_ids": padded}],
                     config=TRANSFORMER_INT8)
    fl = np.asarray(run_graph(qfull, {"input_ids": padded})[0])
    np.testing.assert_array_equal(toks[:, 0],
                                  np.argmax(fl[:, 5, :], axis=-1))


def test_sampling_decode(model, rng):
    full, step = model
    prompt = rng.integers(0, VOCAB, (B, 3)).astype(np.int32)
    dec = GreedyDecoder(step, layers=LAYERS)
    t1, _ = dec.generate(prompt, 4, temperature=0.8, top_k=5, seed=11)
    t2, _ = dec.generate(prompt, 4, temperature=0.8, top_k=5, seed=11)
    np.testing.assert_array_equal(t1, t2)  # seeded sampling is deterministic
    t3, _ = dec.generate(prompt, 4, temperature=0.8, top_k=5, seed=12)
    assert t1.shape == t3.shape == (B, 4)


def test_full_graph_prefill_matches_stepwise(model, rng):
    """One-pass prefill (full graph + K/V capture) produces the same
    caches/tokens as token-by-token stepping."""
    full, step = model
    prompt = rng.integers(0, VOCAB, (B, 5)).astype(np.int32)
    stepwise = GreedyDecoder(step, layers=LAYERS)
    fast = GreedyDecoder(step, layers=LAYERS).attach_prefill(full)
    t1, l1 = stepwise.generate(prompt, 4)
    t2, l2 = fast.generate(prompt, 4)
    np.testing.assert_array_equal(t1, t2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_ondevice_scan_decode_matches_host_loop(model, rng):
    """generate_ondevice (whole decode loop in ONE lax.scan program) emits
    the same greedy tokens as the host-loop generate — the serving path's
    single-dispatch form."""
    full, step = model
    prompt = rng.integers(0, VOCAB, (B, 5)).astype(np.int32)
    host = GreedyDecoder(step, layers=LAYERS).attach_prefill(full)
    dev = GreedyDecoder(step, layers=LAYERS).attach_prefill(full)
    t1, _ = host.generate(prompt, 4)
    t2 = dev.generate_ondevice(prompt, 4)
    np.testing.assert_array_equal(t1, t2)


def test_ondevice_sampling_deterministic(model, rng):
    full, step = model
    prompt = rng.integers(0, VOCAB, (B, 3)).astype(np.int32)
    dec = GreedyDecoder(step, layers=LAYERS).attach_prefill(full)
    a = dec.generate_ondevice(prompt, 5, temperature=0.8, top_k=10, seed=3)
    b = dec.generate_ondevice(prompt, 5, temperature=0.8, top_k=10, seed=3)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (B, 5)
    assert (a >= 0).all() and (a < VOCAB).all()


def test_scanned_generation_matches_host_loop(model, rng):
    """gpt2_generate_scanned (scan-over-layers x scan-over-positions, ONE
    small program) emits the same greedy tokens as the host-loop decoder —
    the O(1)-program serving form for remote-compile-capped environments."""
    from tachikoma_tpu.models.decoding import gpt2_generate_scanned

    full, step = model
    prompt = rng.integers(0, VOCAB, (B, 5)).astype(np.int32)
    host = GreedyDecoder(step, layers=LAYERS).attach_prefill(full)
    t1, _ = host.generate(prompt, 4)
    t2 = gpt2_generate_scanned(full, prompt, 4, max_len=L, hidden=HID,
                               layers=LAYERS, heads=HEADS, ffn_dim=FFN,
                               vocab=VOCAB)
    np.testing.assert_array_equal(t1, t2)
