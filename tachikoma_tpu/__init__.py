"""tachikoma_tpu — a TPU-native integer-inference + trace framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
CortexFoundation/tachikoma (a TVM fork): import models, quantize them to
integer-only graphs, execute with exact integer semantics on the MXU, and emit
deterministic per-operator computational traces for ZKP ingestion — scaling
over TPU pod slices via jax.sharding.

Subpackages:
  ir        — integer graph IR (Symbol-graph), type inference, passes
  ops       — op registry impls: numpy oracle, jnp/XLA, Pallas kernels
  quantize  — calibration + float->integer graph rewriting
  runtime   — interpreters/executors (oracle, jit, trace-emitting)
  trace     — deterministic trace serialization (tachikoma-standard)
  parallel  — mesh/sharding: partitioned conv/matmul, multi-host gather
  frontend  — model importers (torch, onnx)
  models    — built-in model zoo (lenet, resnet, mobilenet, bert, vit, ...)
"""

__version__ = "0.1.0"

from .ir.graph import Graph, GraphBuilder, Node
from .ir.infer import infer_types

# Register the op vocabulary on import.
from .ops import nn as _ops_nn  # noqa: F401
from .ops import qnn as _ops_qnn  # noqa: F401
from .ops import extra as _ops_extra  # noqa: F401
from .ops import tail as _ops_tail  # noqa: F401
from .ops import tail2 as _ops_tail2  # noqa: F401
from .ops import tail3 as _ops_tail3  # noqa: F401
from .ops import control as _ops_control  # noqa: F401
from .ops import dyn as _ops_dyn  # noqa: F401
from .ops import attention as _ops_attention  # noqa: F401

from .runtime.interpreter import Interpreter, run_graph

__all__ = [
    "Graph",
    "GraphBuilder",
    "Node",
    "infer_types",
    "Interpreter",
    "run_graph",
]
