"""Prequantized-PyTorch frontend: torch.ao-quantized models -> integer graph.

The counterpart of the reference's qnn_torch importer
(`/root/reference/python/tvm/relay/frontend/qnn_torch.py`, wired from
`pytorch.py`), redesigned for torch.fx: a model converted with
torch.ao.quantization (FX graph mode `convert_fx`, or eager-mode `convert`
with QuantStub/DeQuantStub) imports as a QDQ graph — every quantized
boundary becomes an adjacent qnn.quantize -> qnn.dequantize pair, quantized
module weights fold to float consts carrying their model scales as
qdq_scale attrs — and the existing FQ2I pass (`quantize/fq2i.py`)
reconstitutes the integer ops with the MODEL'S OWN scales, exactly like the
ONNX QDQ and TFLite import paths.

dtype convention: torch quint8 activations (zero points in [0, 255]) map to
int8 with zero_point - 128 — the same real values, TPU-kernel-friendly.

Numerical parity: torch's fbgemm/qnnpack requantize multiplies the int32
accumulator by a FLOAT scale with round-half-even; this framework's integer
kernels use the 31-bit fixed-point multiply (requantize.cc semantics).  The
two agree except on ties/1-ULP boundaries, so parity vs torch eager is
|diff| <= 1 output quantum (the reference accepts the same tolerance for
qnn_torch imports).
"""

from __future__ import annotations

import numpy as np

from ..ir.graph import Graph
from .torch_fx import _Importer, _to_np


def _np_int_repr(qt) -> np.ndarray:
    import torch

    return torch.int_repr(qt).numpy()


class _QImporter(_Importer):
    """Extends the float fx importer: quantized tensors travel through
    `env` as their DEQUANTIZED float graph values (so every float handler
    works unchanged), while each quantized boundary emits the q -> dq pair
    FQ2I consumes."""

    def _q_dq(self, fxn, float_name: str, layout: str, scale: float,
              zp_int8: int):
        """Emit qnn.quantize -> qnn.dequantize; env gets the dq'd float."""
        q = self.b.call("qnn.quantize", float_name, scale=float(scale),
                        zero_point=int(zp_int8), out_dtype="int8",
                        name=fxn.name + "_q")
        dq = self.b.call("qnn.dequantize", q, scale=float(scale),
                         zero_point=int(zp_int8), name=fxn.name)
        self.set(fxn, dq, layout)

    def _concrete(self, arg):
        """Concrete python/numpy value of an fx arg (literal, pyval, or a
        get_attr node's target attribute)."""
        if not hasattr(arg, "op"):
            return arg
        if self.is_pyval(arg):
            return self.pyval(arg)
        if arg.op == "get_attr":
            val = self.gm
            for part in arg.target.split("."):
                val = getattr(val, part)
            if isinstance(val, self.torch.Tensor):
                return _to_np(val)
            return val
        raise NotImplementedError(f"expected a concrete value, got {arg}")

    @staticmethod
    def _zp_shift(zp, torch_dtype, torch) -> int:
        return int(zp) - 128 if torch_dtype == torch.quint8 else int(zp)

    def _act_dtype(self):
        """The model's quantized-activation dtype (quint8 vs qint8).

        nnq conv/linear/add/cat modules carry output scale/zero_point but
        NOT the activation dtype, and zero-point VALUE ranges overlap in
        [0, 127] — so it is recorded from the graph's quantize entry
        points (nnq.Quantize modules / torch.quantize_per_tensor calls),
        which always precede the quantized region.  Hardcoding quint8 here
        made every qint8-activation model's zero points wrong by 128."""
        dt = getattr(self, "_seen_act_dtype", None)
        return dt if dt is not None else self.torch.quint8

    # -- fx node kinds -------------------------------------------------------

    def get_attr(self, fxn):
        val = self.gm
        for part in fxn.target.split("."):
            val = getattr(val, part)
        if isinstance(val, self.torch.Tensor) and not val.is_quantized:
            super().get_attr(fxn)
        else:
            # scale/zero_point scalars and quantized tensors stay python-side
            # (consumed concretely by the quantize handlers)
            self.set_pyval(fxn, val)

    def _mark_weight_qdq(self, wname: str, qweight):
        """Annotate an imported weight const with its model scales so FQ2I
        recovers the EXACT stored int8 values (frontend/onnx.py _mark_qdq)."""
        torch = self.torch
        if qweight.qscheme() in (torch.per_channel_affine,
                                 torch.per_channel_symmetric):
            scales = qweight.q_per_channel_scales().numpy()
            zps = qweight.q_per_channel_zero_points().numpy()
            axis = int(qweight.q_per_channel_axis())
            per_axis = True
        else:
            scales = np.asarray([qweight.q_scale()])
            zps = np.asarray([qweight.q_zero_point()])
            axis = 0
            per_axis = False
        if np.any(zps != 0):
            return  # integer kernels assume symmetric weights; re-absmax
        if per_axis and axis != 0:
            return  # out-channel axis is 0 in torch (OIHW / (out,in))
        self.b.annotate(wname, qdq_scale=[float(s) for s in scales],
                        qdq_per_axis=per_axis)

    class _FloatView:
        """Presents a quantized conv/linear module as its float equivalent
        for the parent importer's conv2d/linear handlers."""

        def __init__(self, mod, torch):
            qw = mod.weight()
            self.weight = torch.dequantize(qw)
            self.bias = mod.bias()
            for attr in ("stride", "padding", "dilation", "groups"):
                if hasattr(mod, attr):
                    setattr(self, attr, getattr(mod, attr))

    def _quantized_conv_linear(self, fxn, mod, kind: str, relu: bool):
        torch = self.torch
        view = self._FloatView(mod, torch)
        if kind == "conv":
            self.conv2d(fxn, view)
            layout = "nhwc"
        else:
            self.linear(fxn, view)
            layout = "torch"
        self._mark_weight_qdq(fxn.name + "_w", mod.weight())
        out_name = self.env[fxn][0]
        if relu:
            out_name = self.b.call("nn.relu", out_name,
                                   name=fxn.name + "_relu")
        zp = self._zp_shift(mod.zero_point, self._act_dtype(), torch)
        self._q_dq(fxn, out_name, layout, float(mod.scale), zp)

    def call_module(self, fxn, mod):
        torch = self.torch
        import torch.ao.nn.intrinsic.quantized as nniq
        import torch.ao.nn.quantized as nnq

        if isinstance(mod, (nnq.Conv2d, nniq.ConvReLU2d)):
            self._quantized_conv_linear(
                fxn, mod, "conv", isinstance(mod, nniq.ConvReLU2d))
        elif isinstance(mod, (nnq.Linear, nniq.LinearReLU)):
            self._quantized_conv_linear(
                fxn, mod, "linear", isinstance(mod, nniq.LinearReLU))
        elif isinstance(mod, nnq.Quantize):
            name, layout = self.env[fxn.args[0]]
            self._seen_act_dtype = mod.dtype
            zp = self._zp_shift(int(mod.zero_point), mod.dtype, torch)
            self._q_dq(fxn, name, layout, float(mod.scale), zp)
        elif isinstance(mod, nnq.DeQuantize):
            self.set(fxn, *self.env[fxn.args[0]])  # env is already float
        elif type(mod).__name__ == "QFunctional":
            raise NotImplementedError(
                "eager QFunctional modules: use FX graph mode quantization")
        else:
            # float modules (pools, flatten, dropout...) run on the dq'd
            # float values unchanged; FQ2I re-integerizes scale-transparent
            # regions from the surrounding q/dq boundaries
            super().call_module(fxn, mod)

    def call_function(self, fxn):
        torch = self.torch
        t = fxn.target
        ops_q = torch.ops.quantized

        if t is torch.quantize_per_tensor:
            x, scale, zp, dt = fxn.args
            name, layout = self.env[x]
            self._seen_act_dtype = dt
            self._q_dq(fxn, name, layout, float(self._concrete(scale)),
                       self._zp_shift(self._concrete(zp), dt, torch))
        elif t in ("dequantize", torch.dequantize):
            self.set(fxn, *self.env[fxn.args[0]])
        elif t in (ops_q.add, ops_q.add_relu, ops_q.mul):
            a, b_, scale, zp = fxn.args
            op = "multiply" if t is ops_q.mul else "add"
            la, lb = self.layout_of(a), self.layout_of(b_)
            if la == lb:
                an, bn, layout = self.env[a][0], self.env[b_][0], la
            else:
                an, bn, layout = self.as_torch(a), self.as_torch(b_), "torch"
            out = self.b.call(op, an, bn, name=fxn.name + "_f")
            if t is ops_q.add_relu:
                out = self.b.call("nn.relu", out, name=fxn.name + "_relu")
            self._q_dq(fxn, out, layout, float(self._concrete(scale)),
                       self._zp_shift(self._concrete(zp), self._act_dtype(),
                                      torch))
        elif t is ops_q.cat:
            tensors, dim, scale, zp = (fxn.args[0], fxn.args[1],
                                       fxn.args[2], fxn.args[3])
            names = [self.as_torch(x) for x in tensors]
            out = self.b.call("concatenate", *names, axis=int(dim),
                              name=fxn.name + "_f")
            self._q_dq(fxn, out, "torch", float(self._concrete(scale)),
                       self._zp_shift(self._concrete(zp), self._act_dtype(),
                                      torch))
        else:
            super().call_function(fxn)


def from_torch_quantized(model, example_inputs,
                         input_dtypes: dict[str, str] | None = None) -> Graph:
    """Import a torch.ao-quantized model as a QDQ float graph (run
    `quantize.fq2i.fq2i` on the result for the integer graph, or use
    `import_torch_quantized`).

    model: the output of torch.ao convert_fx (a GraphModule), or an
    eager-converted nn.Module (QuantStub/DeQuantStub style — symbolically
    traced here).  example_inputs: dict name -> TORCH shape (NCHW for
    vision), or a single shape tuple."""
    import torch
    import torch.fx

    if isinstance(example_inputs, (tuple, list)) and example_inputs and \
            isinstance(example_inputs[0], int):
        example_inputs = {"x": tuple(example_inputs)}
    gm = model if isinstance(model, torch.fx.GraphModule) \
        else torch.fx.symbolic_trace(model.eval())

    dts = input_dtypes or {}
    placeholders = [n for n in gm.graph.nodes if n.op == "placeholder"]
    ex, var_names = {}, {}
    names = list(example_inputs)
    for i, p in enumerate(placeholders):
        key = p.name if p.name in example_inputs else names[i]
        ex[p.name] = (tuple(example_inputs[key]), dts.get(key, "float32"))
        var_names[p.name] = key
    imp = _QImporter(gm, ex)
    imp.var_names = var_names
    return imp.run()


def import_torch_quantized(model, example_inputs,
                           input_dtypes: dict[str, str] | None = None,
                           config=None) -> Graph:
    """One call: torch.ao-quantized model -> integer-only graph using the
    model's own scales (no calibration)."""
    from ..quantize.fq2i import fq2i

    return fq2i(from_torch_quantized(model, example_inputs, input_dtypes),
                config)
