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
            sc = node.args[2] if len(node.args) > 2 \
                else node.kwargs["scale"]
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


class _MNv3Flavor(torch.nn.Module):
    """MobileNetV3-shaped op set (round-5 breadth): hardswish module +
    functional, scalar add/mul (quantized::add_scalar / mul_scalar),
    relu6, LeakyReLU, ConvTranspose2d — the `quantized::` ops real
    quantized MobileNetV3/torchvision graphs contain
    (reference: qnn_torch.py handlers)."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.conv = nn.Conv2d(3, 8, 3, padding=1)
        self.hs = nn.Hardswish()
        self.r6 = nn.ReLU6()
        self.lr = nn.LeakyReLU(0.1)
        self.ct = nn.ConvTranspose2d(8, 4, 3, stride=2, padding=1,
                                     output_padding=1)
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(4, 5)

    def forward(self, x):
        h = self.conv(x)
        h = self.hs(h)
        h = h + 3.0          # quantized::add_scalar
        h = h * 0.5          # quantized::mul_scalar
        h = self.r6(h)
        h = torch.nn.functional.hardswish(h)   # quantized::hardswish
        h = self.lr(h)       # quantized::leaky_relu or nnq.LeakyReLU
        h = self.ct(h)       # quantized::conv_transpose2d
        h = self.pool(h).flatten(1)
        return self.fc(h)


def test_mobilenetv3_op_breadth_parity():
    torch.manual_seed(0)
    # qnnpack: per-tensor weights (torch's per-channel observer rejects
    # ConvTranspose2d)
    mq = _fx_quantize(_MNv3Flavor(), torch.randn(2, 3, 16, 16),
                      backend="qnnpack")
    got, want, gi = _check_parity(mq, (2, 3, 16, 16))
    out_scale = float(mq.fc.scale)
    diff = np.abs(got - want)
    # several requantize boundaries chain; allow a few quanta end-to-end
    # but demand sub-quantum agreement for the vast majority
    assert diff.max() <= out_scale * 4 + 1e-6, \
        f"{diff.max()} vs out scale {out_scale}"
    assert (diff <= out_scale + 1e-6).mean() >= 0.9
    ops = [n.op for n in gi.nodes]
    assert "qnn.conv2d_transpose" in ops or "nn.conv2d_transpose" in ops


class _DeepResNet(torch.nn.Module):
    """Stacked residual blocks with skip adds + relu (quantized::add_relu)
    and a strided downsample branch — the torchvision quantized-ResNet
    graph shape (reference qnn_torch's primary workload)."""

    class Block(torch.nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            nn = torch.nn
            self.c1 = nn.Conv2d(cin, cout, 3, stride, 1)
            self.r1 = nn.ReLU()
            self.c2 = nn.Conv2d(cout, cout, 3, 1, 1)
            self.down = (nn.Conv2d(cin, cout, 1, stride)
                         if stride != 1 or cin != cout else None)
            self.f = torch.ao.nn.quantized.FloatFunctional()

        def forward(self, x):
            idn = x if self.down is None else self.down(x)
            h = self.c2(self.r1(self.c1(x)))
            return self.f.add_relu(h, idn)

    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.stem = nn.Conv2d(3, 8, 3, padding=1)
        self.b1 = self.Block(8, 8, 1)
        self.b2 = self.Block(8, 16, 2)
        self.b3 = self.Block(16, 16, 1)
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(16, 10)

    def forward(self, x):
        h = self.b3(self.b2(self.b1(self.stem(x))))
        return self.fc(self.pool(h).flatten(1))


def test_quantized_residual_network_parity():
    torch.manual_seed(0)
    mq = _fx_quantize(_DeepResNet(), torch.randn(2, 3, 16, 16),
                      backend="fbgemm")
    got, want, gi = _check_parity(mq, (2, 3, 16, 16))
    out_scale = float(mq.fc.scale)
    diff = np.abs(got - want)
    assert diff.max() <= out_scale * 3 + 1e-6
    assert (diff <= out_scale + 1e-6).mean() >= 0.95
    ops = [n.op for n in gi.nodes]
    # stem + b1(2) + b2(2 + downsample) + b3(2) = 8 integer convs
    assert ops.count("qnn.conv2d") == 8
    assert ops.count("qnn.dense") == 1


class _EagerQF(torch.nn.Module):
    """Eager-mode quantization with QuantStub/DeQuantStub + QFunctional —
    previously raised NotImplementedError (round-4 missing item): symbolic
    tracing inlines QFunctional methods into quantized.add(+kwargs
    scale/zp) / quantized.mul_scalar calls."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.quant = torch.ao.quantization.QuantStub()
        self.conv = nn.Conv2d(3, 8, 3, padding=1)
        self.relu = nn.ReLU()
        self.conv2 = nn.Conv2d(8, 8, 3, padding=1)
        self.qf = torch.ao.nn.quantized.FloatFunctional()
        self.dequant = torch.ao.quantization.DeQuantStub()

    def forward(self, x):
        x = self.quant(x)
        h = self.relu(self.conv(x))
        h = self.qf.add(h, self.conv2(h))
        h = self.qf.mul_scalar(h, 0.5)
        return self.dequant(h)


def test_eager_qfunctional_parity():
    torch.manual_seed(0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m = _EagerQF().eval()
        m.qconfig = torch.ao.quantization.get_default_qconfig("qnnpack")
        torch.ao.quantization.prepare(m, inplace=True)
        g = torch.Generator().manual_seed(0)
        for _ in range(6):
            m(torch.randn(1, 3, 8, 8, generator=g))
        torch.ao.quantization.convert(m, inplace=True)
    got, want, gi = _check_parity(m, (1, 3, 8, 8))
    # output scale = mul_scalar's derived scale (0.5 * add scale)
    scale = 0.5 * _quantized_add_scale(torch.fx.symbolic_trace(m))
    diff = np.abs(got - want)
    assert diff.max() <= scale * 2.001 + 1e-6, \
        f"{diff.max()} vs derived scale {scale}"
    assert [n.op for n in gi.nodes].count("qnn.conv2d") == 2
