"""Prequantized-PyTorch import (frontend/torch_quantized.py) vs torch eager.

The playbook of the TFLite fixture tests: quantize a real model with the
GENUINE torch.ao flow (FX graph mode convert_fx), import, and compare the
integer graph's output against the torch eager quantized model as golden.

Numerical bar (same as the reference's qnn_torch): torch requantizes with
float-scale round-half-even, this framework with 31-bit fixed point — they
may differ on ties, so parity is |diff| <= 1 output quantum, plus exact
equality between the numpy oracle and the XLA executor on the imported
integer graph (the framework's own == contract)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import warnings  # noqa: E402

from tachikoma_tpu.frontend.torch_quantized import (  # noqa: E402
    from_torch_quantized, import_torch_quantized)


def _fx_quantize(model, example, n_calib=8, seed=0, backend="qnnpack"):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from torch.ao.quantization import QConfigMapping, get_default_qconfig
        from torch.ao.quantization.quantize_fx import convert_fx, prepare_fx

        qm = QConfigMapping().set_global(get_default_qconfig(backend))
        mp = prepare_fx(model.eval(), qm, (example,))
        g = torch.Generator().manual_seed(seed)
        for _ in range(n_calib):
            mp(torch.randn(example.shape, generator=g))
        return convert_fx(mp)


class _ConvNet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.conv = nn.Conv2d(3, 8, 3, padding=1)
        self.relu = nn.ReLU()
        self.conv2 = nn.Conv2d(8, 16, 3, stride=2, padding=1)
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(16, 10)

    def forward(self, x):
        x = self.relu(self.conv(x))
        x = self.conv2(x)
        x = self.pool(x).flatten(1)
        return self.fc(x)


class _ResBlockNet(torch.nn.Module):
    """Exercises quantized::add (residual) and maxpool on quantized data."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(4, 8, 3, padding=1)
        self.conv2 = nn.Conv2d(8, 8, 3, padding=1)
        self.conv3 = nn.Conv2d(8, 8, 1)
        self.pool = nn.MaxPool2d(2)
        self.add = torch.ao.nn.quantized.FloatFunctional()

    def forward(self, x):
        y = self.conv1(x)
        z = self.add.add(self.conv2(y), self.conv3(y))
        return self.pool(z)


def _quantized_add_scale(mq) -> float:
    """Output scale of the (sole) quantized::add node in a converted fx
    graph — its scale arg is a get_attr on the GraphModule."""
    for node in mq.graph.nodes:
        if node.op == "call_function" and \
                node.target is torch.ops.quantized.add:
            sc = node.args[2]
            return float(getattr(mq, sc.target)) if hasattr(sc, "op") \
                else float(sc)
    raise AssertionError("no quantized::add in graph")


def _check_parity(mq, shape, seed=1):
    import tachikoma_tpu as tk
    from tachikoma_tpu.runtime.executor import JaxExecutor

    gi = import_torch_quantized(mq, {"x": shape})
    g = torch.Generator().manual_seed(seed)
    xin = torch.randn(shape, generator=g)
    want = mq(xin).detach().numpy()
    got = tk.run_graph(gi, {"x": xin.numpy()})
    got = got[0] if isinstance(got, (list, tuple)) else got
    got = np.asarray(got)
    # oracle == XLA, exact (the framework contract)
    jout = JaxExecutor(gi).run({"x": xin.numpy()})
    jout = jout[0] if isinstance(jout, (list, tuple)) else jout
    np.testing.assert_array_equal(got, np.asarray(jout))
    return got, want, gi


def test_convnet_parity_vs_torch_eager():
    torch.manual_seed(0)
    mq = _fx_quantize(_ConvNet(), torch.randn(2, 3, 32, 32))
    got, want, gi = _check_parity(mq, (2, 3, 32, 32))
    out_scale = float(mq.fc.scale)
    diff = np.abs(got - want)
    assert diff.max() <= out_scale * 1.001 + 1e-6, \
        f"beyond 1 output quantum: {diff.max()} vs scale {out_scale}"
    # the integer graph must actually be integer: at least the two convs
    # and the dense must have become qnn ops
    ops = [n.op for n in gi.nodes]
    assert ops.count("qnn.conv2d") == 2
    assert ops.count("qnn.dense") == 1
    # the adaptive avg pool stays integer (zp passes through the int mean)
    pool_node = next(n for n in gi.nodes if n.op == "nn.adaptive_avg_pool2d")
    assert gi[pool_node.inputs[0]].dtype == "int8"


def test_resblock_quantized_add_and_maxpool():
    torch.manual_seed(0)
    mq = _fx_quantize(_ResBlockNet(), torch.randn(1, 4, 16, 16))
    got, want, gi = _check_parity(mq, (1, 4, 16, 16))
    scale = _quantized_add_scale(mq)
    diff = np.abs(got - want)
    assert diff.max() <= scale * 2.001 + 1e-6, \
        f"beyond 2 quanta: {diff.max()} vs scale {scale}"
    # residual add imported as an integer add (qnn.add or requantized add)
    assert any(n.op in ("qnn.add", "add") for n in gi.nodes)
    assert (np.abs(got - want) <= scale + 1e-6).mean() >= 0.99


def test_qdq_graph_shape():
    """from_torch_quantized emits the QDQ form FQ2I consumes: every
    quantized boundary is an adjacent qnn.quantize -> qnn.dequantize pair
    and weight consts carry qdq_scale attrs."""
    torch.manual_seed(0)
    # fbgemm: per-CHANNEL weight observers (qnnpack is per-tensor)
    mq = _fx_quantize(_ConvNet(), torch.randn(1, 3, 16, 16),
                      backend="fbgemm")
    g = from_torch_quantized(mq, {"x": (1, 3, 16, 16)})
    qs = [n for n in g.nodes if n.op == "qnn.quantize"]
    dqs = [n for n in g.nodes if n.op == "qnn.dequantize"]
    assert len(qs) == len(dqs) >= 4  # input + 2 convs + fc
    # every quantize's only consumer is its dequantize
    users = g.users()
    for q in qs:
        assert [g[u].op for u in users[q.name]] == ["qnn.dequantize"]
    # weight consts carry model scales (per-channel for qnnpack convs)
    marked = [n for n in g.nodes if n.is_const and "qdq_scale" in n.attrs]
    assert len(marked) == 3  # conv, conv2, fc weights
    assert any(n.attrs.get("qdq_per_axis") for n in marked)
    # zero points landed in int8 domain (quint8 zp - 128)
    for q in qs:
        assert -128 <= int(q.attrs["zero_point"]) <= 127


def _fx_quantize_qint8(model, example, n_calib=8, seed=0):
    """qint8-ACTIVATION qconfig: zero points are already in [-128, 127], so
    the importer must NOT apply the quint8 -128 shift (a hardcoded quint8
    assumption made every such model's activation zps wrong by 128)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from torch.ao.quantization import (QConfigMapping,
                                           default_symmetric_qnnpack_qconfig)
        from torch.ao.quantization.backend_config import (
            get_qnnpack_backend_config)
        from torch.ao.quantization.quantize_fx import convert_fx, prepare_fx

        qm = QConfigMapping().set_global(default_symmetric_qnnpack_qconfig)
        bc = get_qnnpack_backend_config()
        mp = prepare_fx(model.eval(), qm, (example,), backend_config=bc)
        g = torch.Generator().manual_seed(seed)
        for _ in range(n_calib):
            mp(torch.randn(example.shape, generator=g))
        return convert_fx(mp, backend_config=bc)


def test_qint8_activation_zero_points():
    """qint8-activation models: zero points import UNSHIFTED (this torch
    build cannot eager-execute qint8 activations on any engine, so the
    golden is the FLOAT model — a 128-off zp saturates every activation
    and blows far past the quantization-noise tolerance)."""
    torch.manual_seed(0)
    model = _ConvNet()
    xin = torch.randn(2, 3, 16, 16, generator=torch.Generator().manual_seed(1))
    want_float = model.eval()(xin).detach().numpy()
    mq = _fx_quantize_qint8(model, torch.randn(2, 3, 16, 16))

    import tachikoma_tpu as tk

    gi = import_torch_quantized(mq, {"x": (2, 3, 16, 16)})
    # qint8 activations: zps import UNSHIFTED (near-symmetric, small);
    # the old hardcoded quint8 shift would put them near -128+zp ~ -120
    for n in gi.nodes:
        if n.op == "qnn.quantize":
            zp = int(np.asarray(n.attrs.get("zero_point", 0)))
            assert abs(zp) < 64, (n.name, n.attrs)
    got = np.asarray(tk.run_graph(gi, {"x": xin.numpy()})[0])
    out_scale = float(mq.fc.scale)
    diff = np.abs(got - want_float)
    # quantization noise across 3 int8 layers stays within a few quanta;
    # a 128-shifted zp clips everything (error ~ 128 * scale)
    assert diff.max() <= out_scale * 8 + 1e-4, \
        f"{diff.max()} vs scale {out_scale}"
