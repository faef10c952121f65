"""PyTorch frontend — torch.fx graph -> tachikoma_tpu Graph.

The counterpart of the reference's `relay.frontend.from_pytorch`
(`python/tvm/relay/frontend/pytorch.py:4655-area from_pytorch`), redesigned
around torch.fx instead of TorchScript, and performing NCHW->NHWC layout
conversion at import time (the role of Relay's ConvertLayout pass,
`src/relay/transforms/convert_layout.cc`) because the TPU-native op set is
NHWC/HWIO-only.

Layout tracking: every produced value carries a layout tag —
  'nhwc'  : a 4D conv-domain tensor stored transposed (torch NCHW -> NHWC)
  'torch' : stored exactly as torch would (any rank)
Shape-sensitive ops (reshape/flatten/matmul/linear/cat-on-C...) coerce their
input back to 'torch' layout with an explicit transpose; conv/pool/bn run in
'nhwc'.  XLA later folds transpose pairs, so the import-time layout churn
costs nothing at run time.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from ..ir.graph import Graph, GraphBuilder
from ..ir.infer import infer_types


def _to_np(t) -> np.ndarray:
    return t.detach().cpu().numpy()


class _Importer:
    def __init__(self, gm, example_inputs: dict[str, tuple[tuple[int, ...], str]]):
        import torch

        self.torch = torch
        self.gm = gm
        self.b = GraphBuilder("from_torch")
        # fx node -> (graph node name, layout)
        self.env: dict[Any, tuple[str, str]] = {}
        self.example_inputs = example_inputs
        self.modules = dict(gm.named_modules())

    # -- layout helpers -----------------------------------------------------
    def as_torch(self, fxn) -> str:
        name, layout = self.env[fxn]
        if layout == "nhwc":
            name = self.b.call("transpose", name, axes=(0, 3, 1, 2))
            self.env[fxn] = (name, "torch")
        return name

    def as_nhwc(self, fxn) -> str:
        name, layout = self.env[fxn]
        if layout == "torch":
            name = self.b.call("transpose", name, axes=(0, 2, 3, 1))
            self.env[fxn] = (name, "nhwc")
        return name

    def layout_of(self, fxn) -> str:
        return self.env[fxn][1]

    def set(self, fxn, name: str, layout: str):
        self.env[fxn] = (name, layout)

    # -- module handlers ----------------------------------------------------
    def conv2d(self, fxn, mod):
        x = self.as_nhwc(fxn.args[0])
        w = _to_np(mod.weight)  # OIHW
        groups = mod.groups
        w_hwio = np.transpose(w, (2, 3, 1, 0))  # -> HW I O  (I = in/groups)
        wn = self.b.const(np.ascontiguousarray(w_hwio), name=fxn.name + "_w")
        pad = mod.padding
        if isinstance(pad, str):
            raise NotImplementedError("string padding not supported")
        ph, pw = (pad, pad) if isinstance(pad, int) else pad
        out = self.b.call(
            "nn.conv2d", x, wn,
            strides=mod.stride if not isinstance(mod.stride, int) else (mod.stride,) * 2,
            padding=(ph, pw, ph, pw),
            dilation=mod.dilation if not isinstance(mod.dilation, int) else (mod.dilation,) * 2,
            groups=groups, name=fxn.name,
        )
        if mod.bias is not None:
            bn = self.b.const(_to_np(mod.bias), name=fxn.name + "_b")
            out = self.b.call("nn.bias_add", out, bn, axis=-1)
        self.set(fxn, out, "nhwc")

    def linear(self, fxn, mod):
        x = self.as_torch(fxn.args[0])
        w = _to_np(mod.weight)  # (out, in)
        wn = self.b.const(np.ascontiguousarray(w.T), name=fxn.name + "_w")
        out = self.b.call("nn.dense", x, wn, name=fxn.name)
        if mod.bias is not None:
            bn = self.b.const(_to_np(mod.bias), name=fxn.name + "_b")
            out = self.b.call("nn.bias_add", out, bn, axis=-1)
        self.set(fxn, out, "torch")

    def batch_norm(self, fxn, mod):
        x = self.as_nhwc(fxn.args[0])
        out = self.b.call(
            "nn.batch_norm", x,
            self.b.const(_to_np(mod.weight), name=fxn.name + "_g"),
            self.b.const(_to_np(mod.bias), name=fxn.name + "_b"),
            self.b.const(_to_np(mod.running_mean), name=fxn.name + "_m"),
            self.b.const(_to_np(mod.running_var), name=fxn.name + "_v"),
            epsilon=mod.eps, name=fxn.name,
        )
        self.set(fxn, out, "nhwc")

    def layer_norm(self, fxn, mod):
        x = self.as_torch(fxn.args[0])
        out = self.b.call(
            "nn.layer_norm", x,
            self.b.const(_to_np(mod.weight), name=fxn.name + "_g"),
            self.b.const(_to_np(mod.bias), name=fxn.name + "_b"),
            axis=-1, epsilon=mod.eps, name=fxn.name,
        )
        self.set(fxn, out, "torch")

    def embedding(self, fxn, mod):
        idx = self.as_torch(fxn.args[0])
        tbl = self.b.const(_to_np(mod.weight), name=fxn.name + "_w")
        out = self.b.call("take", tbl, idx, axis=0, name=fxn.name)
        self.set(fxn, out, "torch")

    def pool2d(self, fxn, mod, kind: str):
        x = self.as_nhwc(fxn.args[0])
        ks = mod.kernel_size if not isinstance(mod.kernel_size, int) else (mod.kernel_size,) * 2
        st = mod.stride or mod.kernel_size
        st = st if not isinstance(st, int) else (st,) * 2
        pad = mod.padding if not isinstance(mod.padding, int) else (mod.padding,) * 2
        attrs = dict(
            pool_size=ks, strides=st, padding=(pad[0], pad[1], pad[0], pad[1]),
            ceil_mode=getattr(mod, "ceil_mode", False),
        )
        if kind == "avg":
            attrs["count_include_pad"] = getattr(mod, "count_include_pad", True)
        out = self.b.call(f"nn.{kind}_pool2d", x, name=fxn.name, **attrs)
        self.set(fxn, out, "nhwc")

    def adaptive_avg_pool2d(self, fxn, output_size):
        x = self.as_nhwc(fxn.args[0])
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        out = self.b.call("nn.adaptive_avg_pool2d", x, output_size=tuple(output_size), name=fxn.name)
        self.set(fxn, out, "nhwc")

    # -- generic elementwise -------------------------------------------------
    def _same_layout_unary(self, fxn, op, **attrs):
        name, layout = self.env[fxn.args[0]]
        out = self.b.call(op, name, name=fxn.name, **attrs)
        self.set(fxn, out, layout)

    def _binary(self, fxn, op):
        a, c = fxn.args[0], fxn.args[1]
        a_is_node = hasattr(a, "op")
        c_is_node = hasattr(c, "op")
        if a_is_node and c_is_node:
            la, lc = self.layout_of(a), self.layout_of(c)
            if la == lc:
                an, cn = self.env[a][0], self.env[c][0]
                layout = la
            else:
                an, cn = self.as_torch(a), self.as_torch(c)
                layout = "torch"
            out = self.b.call(op, an, cn, name=fxn.name)
            self.set(fxn, out, layout)
        else:
            node, scalar = (a, c) if a_is_node else (c, a)
            nn_, layout = self.env[node]
            sc = self.b.const(np.asarray(scalar, dtype=np.float32))
            args = (nn_, sc) if a_is_node else (sc, nn_)
            out = self.b.call(op, *args, name=fxn.name)
            self.set(fxn, out, layout)

    # -- driver --------------------------------------------------------------
    def run(self) -> Graph:
        torch = self.torch
        nnm = torch.nn

        MODULE_MAP: dict[type, Callable] = {
            nnm.Conv2d: self.conv2d,
            nnm.Linear: self.linear,
            nnm.BatchNorm2d: self.batch_norm,
            nnm.LayerNorm: self.layer_norm,
            nnm.Embedding: self.embedding,
        }

        for fxn in self.gm.graph.nodes:
            if fxn.op == "placeholder":
                shape, dtype = self.example_inputs[fxn.name]
                var_name = getattr(self, "var_names", {}).get(fxn.name, fxn.name)
                name = self.b.var(var_name, shape, dtype)
                self.set(fxn, name, "torch")
            elif fxn.op == "get_attr":
                val = self.gm
                for part in fxn.target.split("."):
                    val = getattr(val, part)
                cn = self.b.const(_to_np(val), name=fxn.name)
                self.set(fxn, cn, "torch")
            elif fxn.op == "call_module":
                mod = self.modules[fxn.target]
                h = MODULE_MAP.get(type(mod))
                if h is not None:
                    h(fxn, mod)
                elif isinstance(mod, nnm.ReLU):
                    self._same_layout_unary(fxn, "nn.relu")
                elif isinstance(mod, nnm.ReLU6):
                    self._same_layout_unary(fxn, "clip", a_min=0.0, a_max=6.0)
                elif isinstance(mod, nnm.Hardtanh):
                    self._same_layout_unary(fxn, "clip", a_min=mod.min_val, a_max=mod.max_val)
                elif isinstance(mod, nnm.GELU):
                    self._same_layout_unary(
                        fxn, "nn.gelu",
                        approximate="tanh" if mod.approximate == "tanh" else "none",
                    )
                elif isinstance(mod, nnm.SiLU):
                    self._same_layout_unary(fxn, "nn.silu")
                elif isinstance(mod, nnm.Sigmoid):
                    self._same_layout_unary(fxn, "sigmoid")
                elif isinstance(mod, nnm.Tanh):
                    self._same_layout_unary(fxn, "tanh")
                elif isinstance(mod, nnm.Softmax):
                    x = self.as_torch(fxn.args[0])
                    out = self.b.call("nn.softmax", x, axis=mod.dim, name=fxn.name)
                    self.set(fxn, out, "torch")
                elif isinstance(mod, (nnm.Dropout, nnm.Identity)):
                    self.set(fxn, *self.env[fxn.args[0]])
                elif isinstance(mod, nnm.MaxPool2d):
                    self.pool2d(fxn, mod, "max")
                elif isinstance(mod, nnm.AvgPool2d):
                    self.pool2d(fxn, mod, "avg")
                elif isinstance(mod, nnm.AdaptiveAvgPool2d):
                    self.adaptive_avg_pool2d(fxn, mod.output_size)
                elif isinstance(mod, nnm.Flatten):
                    x = self.as_torch(fxn.args[0])
                    assert mod.start_dim == 1 and mod.end_dim == -1
                    out = self.b.call("nn.batch_flatten", x, name=fxn.name)
                    self.set(fxn, out, "torch")
                elif isinstance(mod, nnm.Hardswish):
                    name, layout = self.env[fxn.args[0]]
                    c3 = self.b.const(np.float32(3.0))
                    c6 = self.b.const(np.float32(6.0))
                    s = self.b.call("add", name, c3)
                    s = self.b.call("clip", s, a_min=0.0, a_max=6.0)
                    s = self.b.call("multiply", name, s)
                    out = self.b.call("divide", s, c6, name=fxn.name)
                    self.set(fxn, out, layout)
                elif isinstance(mod, nnm.Hardsigmoid):
                    name, layout = self.env[fxn.args[0]]
                    c3 = self.b.const(np.float32(3.0))
                    c6 = self.b.const(np.float32(6.0))
                    s = self.b.call("add", name, c3)
                    s = self.b.call("clip", s, a_min=0.0, a_max=6.0)
                    out = self.b.call("divide", s, c6, name=fxn.name)
                    self.set(fxn, out, layout)
                else:
                    raise NotImplementedError(f"module {type(mod).__name__} ({fxn.target})")
            elif fxn.op == "call_function" or fxn.op == "call_method":
                self.call_function(fxn)
            elif fxn.op == "output":
                outs = fxn.args[0]
                if not isinstance(outs, (tuple, list)):
                    outs = (outs,)
                out_names = [self.as_torch(o) for o in outs]
                return infer_types(self.b.build(out_names))
        raise RuntimeError("fx graph had no output node")

    def call_function(self, fxn):
        import operator

        torch = self.torch
        F = torch.nn.functional
        t = fxn.target

        if t in (operator.add, torch.add, "add"):
            self._binary(fxn, "add")
        elif t in (operator.sub, torch.sub, "sub"):
            self._binary(fxn, "subtract")
        elif t in (operator.mul, torch.mul, "mul"):
            self._binary(fxn, "multiply")
        elif t in (operator.truediv, torch.div, "div"):
            self._binary(fxn, "divide")
        elif t in (operator.matmul, torch.matmul, "matmul", torch.bmm, "bmm"):
            a = self.as_torch(fxn.args[0])
            c = self.as_torch(fxn.args[1])
            out = self.b.call("nn.batch_matmul", a, c, name=fxn.name)
            self.set(fxn, out, "torch")
        elif t in (F.relu, torch.relu, "relu"):
            self._same_layout_unary(fxn, "nn.relu")
        elif t is F.relu6:
            self._same_layout_unary(fxn, "clip", a_min=0.0, a_max=6.0)
        elif t in (F.gelu, "gelu"):
            approx = fxn.kwargs.get("approximate", "none")
            self._same_layout_unary(fxn, "nn.gelu", approximate=approx)
        elif t in (F.silu, torch.nn.functional.hardswish):
            self._same_layout_unary(fxn, "nn.silu")
        elif t in (torch.sigmoid, F.sigmoid, "sigmoid"):
            self._same_layout_unary(fxn, "sigmoid")
        elif t in (torch.tanh, F.tanh, "tanh"):
            self._same_layout_unary(fxn, "tanh")
        elif t in (F.softmax, torch.softmax, "softmax"):
            x = self.as_torch(fxn.args[0])
            dim = fxn.kwargs.get("dim", fxn.args[1] if len(fxn.args) > 1 else -1)
            out = self.b.call("nn.softmax", x, axis=dim, name=fxn.name)
            self.set(fxn, out, "torch")
        elif t in (torch.flatten, "flatten"):
            x = self.as_torch(fxn.args[0])
            start = fxn.args[1] if len(fxn.args) > 1 else fxn.kwargs.get("start_dim", 0)
            assert start == 1, "only flatten(start_dim=1) supported"
            out = self.b.call("nn.batch_flatten", x, name=fxn.name)
            self.set(fxn, out, "torch")
        elif t in ("view", "reshape", torch.reshape):
            x = self.as_torch(fxn.args[0])
            shape = fxn.args[1:] if not isinstance(fxn.args[1], (list, tuple)) else fxn.args[1]
            shape = tuple(int(s) if not hasattr(s, "op") else -1 for s in shape)
            out = self.b.call("reshape", x, newshape=shape, name=fxn.name)
            self.set(fxn, out, "torch")
        elif t in ("permute", torch.permute):
            x = self.as_torch(fxn.args[0])
            axes = fxn.args[1:] if not isinstance(fxn.args[1], (list, tuple)) else fxn.args[1]
            out = self.b.call("transpose", x, axes=tuple(axes), name=fxn.name)
            self.set(fxn, out, "torch")
        elif t in ("transpose", torch.transpose):
            x = self.as_torch(fxn.args[0])
            d0, d1 = fxn.args[1], fxn.args[2]
            # our transpose needs a full permutation; recover the rank by
            # type-inferring the graph built so far up to x
            g_tmp = infer_types(self.b.build([x]))
            rank = len(g_tmp[x].shape)
            axes = list(range(rank))
            axes[d0 % rank], axes[d1 % rank] = axes[d1 % rank], axes[d0 % rank]
            out = self.b.call("transpose", x, axes=tuple(axes), name=fxn.name)
            self.set(fxn, out, "torch")
        elif t in (torch.cat, "cat"):
            tensors = fxn.args[0]
            dim = fxn.kwargs.get("dim", fxn.args[1] if len(fxn.args) > 1 else 0)
            layouts = {self.layout_of(x) for x in tensors}
            if layouts == {"nhwc"}:
                names = [self.env[x][0] for x in tensors]
                axis = {0: 0, 1: 3, 2: 1, 3: 2}[dim % 4]
                out = self.b.call("concatenate", *names, axis=axis, name=fxn.name)
                self.set(fxn, out, "nhwc")
            else:
                names = [self.as_torch(x) for x in tensors]
                out = self.b.call("concatenate", *names, axis=dim, name=fxn.name)
                self.set(fxn, out, "torch")
        elif t in (torch.chunk, "chunk"):
            x = self.as_torch(fxn.args[0])
            chunks = fxn.args[1]
            dim = fxn.kwargs.get("dim", fxn.args[2] if len(fxn.args) > 2 else 0)
            out = self.b.call("split", x, indices_or_sections=chunks, axis=dim, name=fxn.name)
            self.set(fxn, out, "torch")
        elif t in (torch.mean, "mean"):
            x = self.as_torch(fxn.args[0])
            dim = fxn.kwargs.get("dim", fxn.args[1] if len(fxn.args) > 1 else None)
            keepdim = fxn.kwargs.get("keepdim", fxn.args[2] if len(fxn.args) > 2 else False)
            out = self.b.call(
                "mean", x,
                axis=tuple(dim) if isinstance(dim, (list, tuple)) else dim,
                keepdims=keepdim, name=fxn.name,
            )
            self.set(fxn, out, "torch")
        elif t in ("contiguous", torch.clone, "clone", F.dropout, torch.dropout, "detach"):
            self.set(fxn, *self.env[fxn.args[0]])
        elif t is operator.getitem:
            src = fxn.args[0]
            idx = fxn.args[1]
            src_name, layout = self.env[src]
            if isinstance(idx, int):
                out = self.b.get_item(src_name, idx, name=fxn.name)
                self.set(fxn, out, layout)
            else:
                raise NotImplementedError(f"getitem with {idx!r}")
        elif t in (F.adaptive_avg_pool2d,):
            self.adaptive_avg_pool2d(fxn, fxn.args[1])
        elif t in (F.avg_pool2d,):
            x = self.as_nhwc(fxn.args[0])
            ks = fxn.args[1]
            ks = (ks, ks) if isinstance(ks, int) else tuple(ks)
            out = self.b.call("nn.avg_pool2d", x, pool_size=ks, strides=ks, name=fxn.name)
            self.set(fxn, out, "nhwc")
        elif t in (F.max_pool2d,):
            x = self.as_nhwc(fxn.args[0])
            ks = fxn.args[1]
            ks = (ks, ks) if isinstance(ks, int) else tuple(ks)
            out = self.b.call("nn.max_pool2d", x, pool_size=ks, strides=ks, name=fxn.name)
            self.set(fxn, out, "nhwc")
        elif t in (torch.pow, operator.pow, "pow"):
            self._binary(fxn, "power")
        elif t in ("size", "dim"):
            raise NotImplementedError("dynamic size() not supported — static shapes only")
        else:
            raise NotImplementedError(f"fx target {t} ({fxn.op})")


def from_torch(model, example_inputs, input_dtypes: dict[str, str] | None = None) -> Graph:
    """Import a torch.nn.Module.

    example_inputs: dict name -> shape tuple, or a single shape tuple for
    single-input models.  Shapes are the TORCH shapes (e.g. NCHW for vision);
    the importer transposes to NHWC internally and the produced Graph's input
    keeps the torch shape.
    """
    import torch
    import torch.fx

    model = model.eval()
    if isinstance(example_inputs, (tuple, list)) and example_inputs and isinstance(
        example_inputs[0], int
    ):
        example_inputs = {"x": tuple(example_inputs)}

    try:
        gm = torch.fx.symbolic_trace(model)
    except Exception:
        # HF transformers models need their specialized tracer
        from transformers.utils import fx as hf_fx

        gm = hf_fx.symbolic_trace(model, input_names=list(example_inputs))

    dts = input_dtypes or {}
    placeholders = [n for n in gm.graph.nodes if n.op == "placeholder"]
    ex = {}
    var_names = {}
    names = list(example_inputs)
    for i, p in enumerate(placeholders):
        key = p.name if p.name in example_inputs else names[i]
        ex[p.name] = (tuple(example_inputs[key]), dts.get(key, "float32"))
        var_names[p.name] = key  # graph input keeps the user's name
    imp = _Importer(gm, ex)
    imp.var_names = var_names
    return imp.run()
