"""Op registry — name -> (type relation, exact numpy impl, jax impl, flops).

Plays the role of the reference's Relay op registry (214 `RELAY_REGISTER_OP`
sites under `src/relay/op/`) and its per-op type relations, but as a flat
Python registry: the op set is the *trace vocabulary* (SURVEY.md §8.3), so op
identity must survive from import through quantization to trace emission.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Mapping, Sequence

from .graph import Node

# (shape, dtype) pair describing one tensor value.
TensorType = tuple[tuple[int, ...], str]


class OpNotRegistered(KeyError):
    pass


@dataclass
class OpDef:
    name: str
    # infer(node, input_types) -> output type (or list of types for tuple ops)
    infer: Callable[[Node, Sequence[TensorType]], TensorType | list[TensorType]] | None = None
    # Exact reference implementation over numpy arrays (the oracle; the role
    # of Relay's interpreter `src/relay/backend/interpreter.cc:297`).
    np_impl: Callable | None = None
    # jittable jnp implementation (the XLA path).
    jax_impl: Callable | None = None
    # flops(node, input_types) -> int multiply-accumulate count, for rooflines.
    flops: Callable[[Node, Sequence[TensorType]], int] | None = None
    # Extra metadata (e.g. trace op id).
    meta: dict[str, Any] = field(default_factory=dict)


_REGISTRY: dict[str, OpDef] = {}


def register_op(name: str, **kw) -> OpDef:
    od = _REGISTRY.get(name)
    if od is None:
        od = OpDef(name=name)
        _REGISTRY[name] = od
    for k, v in kw.items():
        setattr(od, k, v)
    return od


def get_op(name: str) -> OpDef:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise OpNotRegistered(name) from None


def has_op(name: str) -> bool:
    return name in _REGISTRY


def all_ops() -> list[str]:
    return sorted(_REGISTRY)


def _attach(name: str, attr: str):
    def deco(fn):
        register_op(name, **{attr: fn})
        return fn

    return deco


def infer_rule(name: str):
    """Decorator: register the type relation for op `name`."""
    return _attach(name, "infer")


def np_impl(name: str):
    """Decorator: register the exact numpy oracle impl for op `name`."""
    return _attach(name, "np_impl")


def jax_impl(name: str):
    """Decorator: register the jnp/XLA impl for op `name`."""
    return _attach(name, "jax_impl")


def flops_rule(name: str):
    return _attach(name, "flops")
