"""Torch FX frontend tests — model-level parity vs the source framework
(the reference's frontend test strategy, `tests/python/frontend/pytorch/`)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tachikoma_tpu import run_graph  # noqa: E402
from tachikoma_tpu.frontend.torch_fx import from_torch  # noqa: E402


def _check(model, shape, rtol=1e-4, atol=1e-5, seed=0):
    model = model.eval()
    g = from_torch(model, {"x": shape})
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(shape).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    got = run_graph(g, {"x": x})[0]
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
    return g


def test_simple_cnn():
    m = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, stride=2, padding=1),
        torch.nn.BatchNorm2d(8),
        torch.nn.ReLU(),
        torch.nn.Conv2d(8, 16, 3, padding=1, groups=8),
        torch.nn.ReLU6(),
        torch.nn.MaxPool2d(2),
        torch.nn.Flatten(),
        torch.nn.Linear(16 * 4 * 4, 10),
        torch.nn.Softmax(dim=-1),
    )
    g = _check(m, (2, 3, 16, 16))
    ops = {n.op for n in g.nodes}
    assert "nn.conv2d" in ops and "nn.dense" in ops


def test_residual_and_pool():
    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = torch.nn.Conv2d(4, 4, 3, padding=1)
            self.c2 = torch.nn.Conv2d(4, 4, 3, padding=1)
            self.gap = torch.nn.AdaptiveAvgPool2d(1)
            self.fc = torch.nn.Linear(4, 3)

        def forward(self, x):
            y = torch.relu(self.c1(x))
            y = self.c2(y) + x
            y = self.gap(y)
            y = torch.flatten(y, 1)
            return self.fc(y)

    _check(Block(), (2, 4, 8, 8))


def test_avgpool_cat_chunk():
    class M(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = torch.nn.Conv2d(2, 4, 1)
            self.pool = torch.nn.AvgPool2d(2)

        def forward(self, x):
            y = self.pool(self.c1(x))
            a, b = torch.chunk(y, 2, dim=1)
            return torch.cat([a, b * 2.0], dim=1)

    _check(M(), (1, 2, 8, 8))


def test_mlp_gelu_layernorm():
    m = torch.nn.Sequential(
        torch.nn.Linear(16, 32),
        torch.nn.GELU(),
        torch.nn.LayerNorm(32),
        torch.nn.Linear(32, 4),
    )
    _check(m, (3, 16))


def test_attention_like():
    class Attn(torch.nn.Module):
        def __init__(self, d=16, h=2):
            super().__init__()
            self.q = torch.nn.Linear(d, d)
            self.k = torch.nn.Linear(d, d)
            self.v = torch.nn.Linear(d, d)
            self.o = torch.nn.Linear(d, d)
            self.h = h
            self.d = d

        def forward(self, x):
            B, T, D = 2, 6, self.d
            q = self.q(x).reshape(B, T, self.h, D // self.h).permute(0, 2, 1, 3)
            k = self.k(x).reshape(B, T, self.h, D // self.h).permute(0, 2, 3, 1)
            v = self.v(x).reshape(B, T, self.h, D // self.h).permute(0, 2, 1, 3)
            att = torch.softmax(torch.matmul(q, k) / (D // self.h) ** 0.5, dim=-1)
            y = torch.matmul(att, v).permute(0, 2, 1, 3).reshape(B, T, D)
            return self.o(y)

    _check(Attn(), (2, 6, 16), rtol=1e-3, atol=1e-5)


def test_embedding_take():
    class M(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = torch.nn.Embedding(11, 8)
            self.fc = torch.nn.Linear(8, 4)

        def forward(self, x):
            return self.fc(self.emb(x))

    m = M().eval()
    g = from_torch(m, {"x": (2, 5)}, input_dtypes={"x": "int32"})
    idx = np.array([[0, 3, 10, 2, 1], [4, 4, 9, 8, 7]], dtype=np.int32)
    with torch.no_grad():
        want = m(torch.from_numpy(idx.astype(np.int64))).numpy()
    got = run_graph(g, {"x": idx})[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_import_then_quantize():
    m = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, padding=1),
        torch.nn.BatchNorm2d(8),
        torch.nn.ReLU(),
        torch.nn.Flatten(),
        torch.nn.Linear(8 * 8 * 8, 5),
    ).eval()
    g = from_torch(m, {"x": (1, 3, 8, 8)})
    rng = np.random.default_rng(0)
    data = [rng.standard_normal((1, 3, 8, 8)).astype(np.float32) for _ in range(2)]
    from tachikoma_tpu.quantize.quantizer import quantize

    qg = quantize(g, data)
    assert any(n.op == "qnn.conv2d" for n in qg.nodes)
    with torch.no_grad():
        want = m(torch.from_numpy(data[0])).numpy()
    got = run_graph(qg, {"x": data[0]})[0]
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.99


@pytest.mark.slow
def test_huggingface_bert():
    """Import a HF transformers BERT (config-constructed; the HF fx tracer
    path + pyval shape folding + SDPA decomposition + dict outputs)."""
    transformers = pytest.importorskip("transformers")
    m = transformers.BertModel(
        transformers.BertConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64,
        )
    ).eval()
    g = from_torch(m, {"input_ids": (2, 16)}, input_dtypes={"input_ids": "int32"})
    ids = np.random.default_rng(0).integers(0, 100, (2, 16)).astype(np.int32)
    from tachikoma_tpu import run_graph

    got = run_graph(g, {"input_ids": ids})
    with torch.no_grad():
        ref = m(input_ids=torch.from_numpy(ids.astype(np.int64)))
    np.testing.assert_allclose(got[0], ref.last_hidden_state.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(got[1], ref.pooler_output.numpy(), rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_huggingface_bert_quantizes():
    transformers = pytest.importorskip("transformers")
    m = transformers.BertModel(
        transformers.BertConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64,
        )
    ).eval()
    g = from_torch(m, {"input_ids": (2, 16)}, input_dtypes={"input_ids": "int32"})
    from tachikoma_tpu.quantize.config import TRANSFORMER_INT8
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu import run_graph

    rng = np.random.default_rng(0)
    data = [{"input_ids": rng.integers(0, 100, (2, 16)).astype(np.int32)} for _ in range(2)]
    qg = quantize(g, data, TRANSFORMER_INT8)
    assert any(n.op == "qnn.dense" for n in qg.nodes)
    fout = run_graph(g, data[0])[0]
    qout = run_graph(qg, data[0])[0]
    assert np.corrcoef(fout.ravel(), qout.ravel())[0, 1] > 0.97
