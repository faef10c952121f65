"""Model zoo coverage: every family builds, runs, and quantizes.

(The reference zoo parity check, `python/tvm/relay/testing/` — SURVEY.md §2.9.)"""

import numpy as np
import pytest

from tachikoma_tpu import run_graph
from tachikoma_tpu.models import vision as V
from tachikoma_tpu.quantize.quantizer import quantize

CASES = [
    ("vgg11", lambda: V.vgg(11, image_size=32), (1, 32, 32, 3), 0.98),
    ("squeezenet", lambda: V.squeezenet(image_size=96), (1, 96, 96, 3), 0.99),
    ("densenet", lambda: V.densenet(image_size=32, blocks=(2, 2)), (1, 32, 32, 3), 0.98),
    ("inception", lambda: V.inception_v3_stem(image_size=96), (1, 96, 96, 3), 0.95),
    ("dcgan", lambda: V.dcgan_generator(), (1, 100), 0.99),
    ("dqn", lambda: V.dqn(), (1, 84, 84, 4), 0.99),
]


@pytest.mark.parametrize("name,build,shape,min_corr", CASES, ids=[c[0] for c in CASES])
def test_zoo_model_quantizes(name, build, shape, min_corr):
    rng = np.random.default_rng(0)
    g = build()
    x = rng.standard_normal(shape).astype(np.float32)
    fout = run_graph(g, x)[0]
    qg = quantize(g, [x])
    qout = run_graph(qg, x)[0]
    assert fout.shape == qout.shape
    corr = np.corrcoef(fout.ravel(), qout.ravel())[0, 1]
    assert corr > min_corr, f"{name}: corr {corr}"


def test_gpt2_causal(rng):
    """Decoder-only LM: perturbing token t must not change logits < t."""
    from tachikoma_tpu import run_graph
    from tachikoma_tpu.models.transformer import gpt2

    g = gpt2(batch_size=1, seq_len=8, hidden=32, layers=2, heads=4,
             ffn_dim=64, vocab=97)
    ids = rng.integers(0, 97, (1, 8)).astype(np.int32)
    base = run_graph(g, {"input_ids": ids})[0]
    ids2 = ids.copy()
    ids2[0, 5] = (ids2[0, 5] + 1) % 97
    pert = run_graph(g, {"input_ids": ids2})[0]
    np.testing.assert_allclose(base[0, :5], pert[0, :5], rtol=1e-5,
                               atol=1e-5)
    assert np.abs(base[0, 5:] - pert[0, 5:]).max() > 1e-3


def test_gpt2_quantizes(rng):
    from tachikoma_tpu import run_graph
    from tachikoma_tpu.models.transformer import gpt2
    from tachikoma_tpu.quantize.config import TRANSFORMER_INT8
    from tachikoma_tpu.quantize.quantizer import quantize

    g = gpt2(batch_size=1, seq_len=8, hidden=32, layers=1, heads=4,
             ffn_dim=64, vocab=61)
    calib = [rng.integers(0, 61, (1, 8)).astype(np.int32) for _ in range(2)]
    qg = quantize(g, calib, config=TRANSFORMER_INT8)
    fl = run_graph(g, {"input_ids": calib[0]})[0]
    qi = run_graph(qg, {"input_ids": calib[0]})[0]
    # int8 LM logits track float argmax at most positions
    agree = (fl.argmax(-1) == qi.argmax(-1)).mean()
    assert agree >= 0.5, f"argmax agreement {agree}"


def test_gpt2_executor_matches_oracle(rng):
    from tachikoma_tpu import run_graph
    from tachikoma_tpu.models.transformer import gpt2
    from tachikoma_tpu.runtime.executor import JaxExecutor

    g = gpt2(batch_size=1, seq_len=8, hidden=32, layers=1, heads=4,
             ffn_dim=64, vocab=61)
    ids = rng.integers(0, 61, (1, 8)).astype(np.int32)
    o = run_graph(g, {"input_ids": ids})[0]
    j = np.asarray(JaxExecutor(g).run({"input_ids": ids})[0])
    np.testing.assert_allclose(o, j, rtol=1e-3, atol=5e-3)


def test_resnet_3d(rng):
    """3D video ResNet (the reference zoo's resnet_3d): builds, infers,
    float + quantized run with oracle==XLA on the integer graph."""
    from tachikoma_tpu import run_graph
    from tachikoma_tpu.models.vision import resnet_3d
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.runtime.executor import run_graph_jax

    g = resnet_3d(18, batch_size=1, frames=4, image_size=16, num_classes=10)
    x = rng.standard_normal((1, 4, 16, 16, 3)).astype(np.float32)
    o = run_graph(g, x)[0]
    j = run_graph_jax(g, x)[0]
    assert o.shape == (1, 10)
    np.testing.assert_allclose(o, j, rtol=5e-4, atol=1e-5)
    qg = quantize(g, [x])
    qo = run_graph(qg, x)
    qj = run_graph_jax(qg, x)
    for a, c in zip(qo, qj):
        a, c = np.asarray(a), np.asarray(c)
        if a.dtype.kind in "iu":
            assert (a == c).all()
        else:
            np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6)
