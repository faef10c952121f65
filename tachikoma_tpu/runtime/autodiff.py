"""Gradient transform over graphs — the reference's gradient passes
(`src/relay/transforms/first_order_gradient.cc`,
`higher_order_gradient.cc`, per-op gradients in `python/tvm/relay/op/_tensor_grad.py`)
re-based on the platform: the whole graph is ONE traced XLA program
(`runtime/executor.py`), so `jax.grad` differentiates it directly — no
per-op gradient registry to maintain, and the backward pass fuses/schedules
under the same XLA compilation as the forward.

`grad_graph` returns a callable producing (loss, grads-w.r.t.-params);
`value_and_grad_fn` exposes the raw jitted function for training loops.
Where explicit backward *ops* are wanted at the IR level (e.g. exporting a
weight-gradient graph), `nn.conv2d_backward_weight` (ops/tail3.py) provides
the reference's conv2d_grad analog as a first-class op.
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

import numpy as np

from ..ir.graph import Graph
from .executor import JaxExecutor


def value_and_grad_fn(graph: Graph, loss_index: int = 0,
                      wrt: Sequence[str] | None = None,
                      remat: bool = False):
    """(jitted_fn, params) with jitted_fn(params, inputs) ->
    (loss, {param: grad}).

    loss_index selects which graph output is the scalar loss; wrt limits the
    differentiated parameter set (default: every float param).  remat wraps
    the forward in jax.checkpoint — activations are recomputed in the
    backward pass instead of stored (the TPU HBM/FLOPs trade; XLA reschedules
    the whole program around it).
    """
    import jax

    ex = JaxExecutor(graph)
    run_fn, params = ex.make_jit_fn()
    if remat:
        run_fn = jax.checkpoint(run_fn)
    if wrt is None:
        wrt = [k for k, v in params.items()
               if np.issubdtype(np.asarray(v).dtype, np.floating)]
    wrt = list(wrt)
    frozen = {k: v for k, v in params.items() if k not in wrt}

    def loss_fn(train_params: dict, inputs: dict):
        outs = run_fn({**frozen, **train_params}, inputs)
        loss = outs[loss_index]
        if getattr(loss, "ndim", 0) != 0:
            raise ValueError(
                f"graph output {loss_index} is not scalar: shape "
                f"{getattr(loss, 'shape', None)}")
        return loss

    vg = jax.jit(jax.value_and_grad(loss_fn))
    train0 = {k: params[k] for k in wrt}
    return vg, train0, frozen


def grad_graph(graph: Graph, loss_index: int = 0,
               wrt: Sequence[str] | None = None) -> Callable:
    """Callable(inputs) -> (loss, {param_name: gradient}) for a graph whose
    `loss_index` output is a scalar loss."""
    vg, train0, _ = value_and_grad_fn(graph, loss_index, wrt)

    def run(inputs: Mapping[str, np.ndarray]):
        loss, grads = vg(train0, dict(inputs))
        return np.asarray(loss), {k: np.asarray(v) for k, v in grads.items()}

    return run
