"""Secondary op surface — the long tail of the reference's registry.

Covers the elementwise/reduce/transform families of `src/relay/op/tensor/`
(SURVEY.md §8.1) that the primary models don't exercise but frontends and
user graphs may: trig/hyperbolic ops, log variants, predicates, sorting,
cumulative ops, normalization ops (lrn, l2_normalize, instance/group norm),
stack/reverse/repeat.
"""

from __future__ import annotations

import numpy as np

from ..ir.graph import Node
from ..ir.registry import infer_rule, jax_impl, np_impl, register_op
from ..utils import dtypes as dt
from .nn import _norm_axes, _reduce_rel, _same_rel, broadcast_shapes


def _register_unary(name: str, np_fn, jax_name: str | None = None):
    def np_i(x, *, node: Node):
        return np_fn(x.astype(np.float32)).astype(x.dtype)

    def jax_i(x, *, node: Node):
        import jax.numpy as jnp

        fn = getattr(jnp, jax_name or name)
        return fn(x.astype(jnp.float32)).astype(x.dtype)

    register_op(name, infer=_same_rel, np_impl=np_i, jax_impl=jax_i)


for _n, _f in {
    "sin": np.sin, "cos": np.cos, "tan": np.tan,
    "asin": np.arcsin, "acos": np.arccos, "atan": np.arctan,
    "sinh": np.sinh, "cosh": np.cosh,
    "asinh": np.arcsinh, "acosh": np.arccosh, "atanh": np.arctanh,
    "log2": np.log2, "log10": np.log10, "trunc": np.trunc,
}.items():
    _jax_names = {"asin": "arcsin", "acos": "arccos", "atan": "arctan",
                  "asinh": "arcsinh", "acosh": "arccosh", "atanh": "arctanh"}
    _register_unary(_n, _f, _jax_names.get(_n))


def _pred_rel(node, ins):
    (a, _) = ins[0]
    return tuple(a), "bool"


for _n, _f in {"isnan": np.isnan, "isinf": np.isinf, "isfinite": np.isfinite}.items():
    def _mk(f):
        def np_i(x, *, node: Node):
            return f(x.astype(np.float32))

        def jax_i(x, *, node: Node):
            import jax.numpy as jnp

            return getattr(jnp, f.__name__)(x.astype(jnp.float32))

        return np_i, jax_i
    _np_i, _jax_i = _mk(_f)
    register_op(_n, infer=_pred_rel, np_impl=_np_i, jax_impl=_jax_i)


@infer_rule("logical_xor")
def _lxor_rel(node, ins):
    (a, _), (b, _) = ins[0], ins[1]
    return broadcast_shapes(a, b), "bool"


@np_impl("logical_xor")
def _lxor_np(a, b, *, node: Node):
    return np.logical_xor(a, b)


@jax_impl("logical_xor")
def _lxor_jax(a, b, *, node: Node):
    import jax.numpy as jnp

    return jnp.logical_xor(a, b)


@infer_rule("bitwise_not")
def _bnot_rel(node, ins):
    return ins[0]


@np_impl("bitwise_not")
def _bnot_np(a, *, node: Node):
    return np.bitwise_not(a)


@jax_impl("bitwise_not")
def _bnot_jax(a, *, node: Node):
    import jax.numpy as jnp

    return jnp.bitwise_not(a)


# -- normalization family ----------------------------------------------------

@infer_rule("nn.l2_normalize")
def _l2n_rel(node, ins):
    return ins[0]


@np_impl("nn.l2_normalize")
def _l2n_np(x, *, node: Node):
    axes = _norm_axes(node, x.ndim) or (x.ndim - 1,)
    eps = np.float32(node.attrs.get("eps", 1e-10))
    x32 = x.astype(np.float32)
    denom = np.sqrt(np.maximum((x32 * x32).sum(axis=tuple(axes), keepdims=True), eps))
    return (x32 / denom).astype(x.dtype)


@jax_impl("nn.l2_normalize")
def _l2n_jax(x, *, node: Node):
    import jax.numpy as jnp

    axes = _norm_axes(node, x.ndim) or (x.ndim - 1,)
    eps = np.float32(node.attrs.get("eps", 1e-10))
    x32 = x.astype(jnp.float32)
    denom = jnp.sqrt(jnp.maximum((x32 * x32).sum(axis=tuple(axes), keepdims=True), eps))
    return (x32 / denom).astype(x.dtype)


@infer_rule("nn.lrn")
def _lrn_rel(node, ins):
    return ins[0]


def _lrn_math(xp, x, size, axis, alpha, beta, bias):
    half = size // 2
    sq = x * x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (half, half)
    sq_p = xp.pad(sq, pads) if xp is np else xp.pad(sq, pads)
    acc = xp.zeros_like(x)
    for i in range(size):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + x.shape[axis])
        acc = acc + sq_p[tuple(sl)]
    return x / (bias + (alpha / size) * acc) ** beta


@np_impl("nn.lrn")
def _lrn_np(x, *, node: Node):
    out = _lrn_math(
        np, x.astype(np.float32), int(node.attrs.get("size", 5)),
        int(node.attrs.get("axis", -1)) % x.ndim,
        np.float32(node.attrs.get("alpha", 1e-4)),
        np.float32(node.attrs.get("beta", 0.75)),
        np.float32(node.attrs.get("bias", 2.0)),
    )
    return out.astype(x.dtype)


@jax_impl("nn.lrn")
def _lrn_jax(x, *, node: Node):
    import jax.numpy as jnp

    out = _lrn_math(
        jnp, x.astype(jnp.float32), int(node.attrs.get("size", 5)),
        int(node.attrs.get("axis", -1)) % x.ndim,
        np.float32(node.attrs.get("alpha", 1e-4)),
        np.float32(node.attrs.get("beta", 0.75)),
        np.float32(node.attrs.get("bias", 2.0)),
    )
    return out.astype(x.dtype)


def _inst_group_norm(xp, x, gamma, beta, groups, axis, eps):
    # x NHWC; normalize over spatial dims (+ channel-group slice)
    n = x.shape[0]
    c = x.shape[axis]
    x32 = x.astype(xp.float32 if xp is not np else np.float32)
    moved = xp.moveaxis(x32, axis, -1)
    spatial = moved.shape[1:-1]
    grouped = moved.reshape(n, int(np.prod(spatial)), groups, c // groups)
    mu = grouped.mean(axis=(1, 3), keepdims=True)
    var = ((grouped - mu) ** 2).mean(axis=(1, 3), keepdims=True)
    normed = (grouped - mu) / xp.sqrt(var + eps)
    normed = normed.reshape(moved.shape)
    normed = normed * gamma.reshape((1,) * (moved.ndim - 1) + (-1,)) + beta.reshape(
        (1,) * (moved.ndim - 1) + (-1,)
    )
    return xp.moveaxis(normed, -1, axis)


@infer_rule("nn.instance_norm")
def _in_rel(node, ins):
    return ins[0]


@np_impl("nn.instance_norm")
def _in_np(x, gamma, beta, *, node: Node):
    c = x.shape[int(node.attrs.get("axis", -1))]
    out = _inst_group_norm(np, x, gamma, beta, c, int(node.attrs.get("axis", -1)) % x.ndim,
                           np.float32(node.attrs.get("epsilon", 1e-5)))
    return out.astype(x.dtype)


@jax_impl("nn.instance_norm")
def _in_jax(x, gamma, beta, *, node: Node):
    import jax.numpy as jnp

    c = x.shape[int(node.attrs.get("axis", -1))]
    out = _inst_group_norm(jnp, x, gamma, beta, c, int(node.attrs.get("axis", -1)) % x.ndim,
                           np.float32(node.attrs.get("epsilon", 1e-5)))
    return out.astype(x.dtype)


@infer_rule("nn.group_norm")
def _gn_rel(node, ins):
    return ins[0]


@np_impl("nn.group_norm")
def _gn_np(x, gamma, beta, *, node: Node):
    out = _inst_group_norm(
        np, x, gamma, beta, int(node.attrs["num_groups"]),
        int(node.attrs.get("axis", -1)) % x.ndim,
        np.float32(node.attrs.get("epsilon", 1e-5)),
    )
    return out.astype(x.dtype)


@jax_impl("nn.group_norm")
def _gn_jax(x, gamma, beta, *, node: Node):
    import jax.numpy as jnp

    out = _inst_group_norm(
        jnp, x, gamma, beta, int(node.attrs["num_groups"]),
        int(node.attrs.get("axis", -1)) % x.ndim,
        np.float32(node.attrs.get("epsilon", 1e-5)),
    )
    return out.astype(x.dtype)


# -- transforms --------------------------------------------------------------

@infer_rule("stack")
def _stack_rel(node, ins):
    axis = int(node.attrs.get("axis", 0))
    (a, adt) = ins[0]
    axis = axis % (len(a) + 1)
    return tuple(a[:axis]) + (len(ins),) + tuple(a[axis:]), adt


@np_impl("stack")
def _stack_np(*args, node: Node):
    return np.stack(args, axis=int(node.attrs.get("axis", 0)))


@jax_impl("stack")
def _stack_jax(*args, node: Node):
    import jax.numpy as jnp

    return jnp.stack(args, axis=int(node.attrs.get("axis", 0)))


@infer_rule("reverse")
def _rev_rel(node, ins):
    return ins[0]


@np_impl("reverse")
def _rev_np(a, *, node: Node):
    return np.flip(a, axis=int(node.attrs["axis"]))


@jax_impl("reverse")
def _rev_jax(a, *, node: Node):
    import jax.numpy as jnp

    return jnp.flip(a, axis=int(node.attrs["axis"]))


@infer_rule("repeat")
def _rep_rel(node, ins):
    (a, adt) = ins[0]
    axis = int(node.attrs["axis"]) % len(a)
    reps = int(node.attrs["repeats"])
    shape = list(a)
    shape[axis] *= reps
    return tuple(shape), adt


@np_impl("repeat")
def _rep_np(a, *, node: Node):
    return np.repeat(a, int(node.attrs["repeats"]), axis=int(node.attrs["axis"]))


@jax_impl("repeat")
def _rep_jax(a, *, node: Node):
    import jax.numpy as jnp

    return jnp.repeat(a, int(node.attrs["repeats"]), axis=int(node.attrs["axis"]))


@infer_rule("cumsum")
def _cumsum_rel(node, ins):
    (a, adt) = ins[0]
    if str(adt) in ("int8", "uint8", "int16", "int32"):
        return tuple(a), node.attrs.get("dtype", "int32")
    return tuple(a), node.attrs.get("dtype", adt)


@np_impl("cumsum")
def _cumsum_np(a, *, node: Node):
    axis = node.attrs.get("axis")
    dtype = node.attrs.get("dtype") or (
        "int32" if str(a.dtype) in ("int8", "uint8", "int16", "int32") else str(a.dtype)
    )
    return np.cumsum(a.astype(dtype), axis=axis).astype(dtype)


@jax_impl("cumsum")
def _cumsum_jax(a, *, node: Node):
    import jax.numpy as jnp

    axis = node.attrs.get("axis")
    dtype = node.attrs.get("dtype") or (
        "int32" if str(a.dtype) in ("int8", "uint8", "int16", "int32") else str(a.dtype)
    )
    return jnp.cumsum(a.astype(jnp.dtype(dtype)), axis=axis)


def _sort_rel(node, ins):
    return ins[0]


@infer_rule("sort")
def _sort_rel_(node, ins):
    return ins[0]


@np_impl("sort")
def _sort_np(a, *, node: Node):
    axis = int(node.attrs.get("axis", -1))
    out = np.sort(a, axis=axis)
    return out[::-1] if node.attrs.get("is_ascend", True) is False and a.ndim == 1 else out


@jax_impl("sort")
def _sort_jax(a, *, node: Node):
    import jax.numpy as jnp

    return jnp.sort(a, axis=int(node.attrs.get("axis", -1)))


@infer_rule("argsort")
def _argsort_rel(node, ins):
    (a, _) = ins[0]
    return tuple(a), node.attrs.get("dtype", "int32")


@np_impl("argsort")
def _argsort_np(a, *, node: Node):
    axis = int(node.attrs.get("axis", -1))
    return np.argsort(a, axis=axis, kind="stable").astype(node.attrs.get("dtype", "int32"))


@jax_impl("argsort")
def _argsort_jax(a, *, node: Node):
    import jax.numpy as jnp

    axis = int(node.attrs.get("axis", -1))
    return jnp.argsort(a, axis=axis, stable=True).astype(
        jnp.dtype(node.attrs.get("dtype", "int32"))
    )


@infer_rule("topk")
def _topk_rel(node, ins):
    (a, adt) = ins[0]
    k = int(node.attrs["k"])
    axis = int(node.attrs.get("axis", -1)) % len(a)
    shape = list(a)
    shape[axis] = k
    ret = node.attrs.get("ret_type", "both")
    if ret == "both":
        return [(tuple(shape), adt), (tuple(shape), node.attrs.get("dtype", "int32"))]
    if ret == "values":
        return tuple(shape), adt
    return tuple(shape), node.attrs.get("dtype", "int32")


@np_impl("topk")
def _topk_np(a, *, node: Node):
    k = int(node.attrs["k"])
    axis = int(node.attrs.get("axis", -1)) % a.ndim
    idx = np.argsort(-np.moveaxis(a, axis, -1), axis=-1, kind="stable")[..., :k]
    vals = np.take_along_axis(np.moveaxis(a, axis, -1), idx, axis=-1)
    vals = np.moveaxis(vals, -1, axis)
    idx = np.moveaxis(idx, -1, axis).astype(node.attrs.get("dtype", "int32"))
    ret = node.attrs.get("ret_type", "both")
    if ret == "both":
        return [vals, idx]
    return vals if ret == "values" else idx


@jax_impl("topk")
def _topk_jax(a, *, node: Node):
    import jax
    import jax.numpy as jnp

    k = int(node.attrs["k"])
    axis = int(node.attrs.get("axis", -1)) % a.ndim
    moved = jnp.moveaxis(a, axis, -1)
    vals, idx = jax.lax.top_k(moved, k)
    vals = jnp.moveaxis(vals, -1, axis)
    idx = jnp.moveaxis(idx, -1, axis).astype(jnp.dtype(node.attrs.get("dtype", "int32")))
    ret = node.attrs.get("ret_type", "both")
    if ret == "both":
        return [vals, idx]
    return vals if ret == "values" else idx


# aliases the reference registers as distinct ops.  Impls delegate LAZILY:
# the target's jax impl registers only when ops/jax_ops is imported, which
# happens after this module (a snapshot alias froze jax_impl=None and
# crashed the GPT-2 LM head on the executor).
def _alias(name: str, target: str):
    from ..ir.registry import get_op

    t = get_op(target)

    def _np(*args, node: Node):
        return get_op(target).np_impl(*args, node=node)

    def _jax(*args, node: Node):
        return get_op(target).jax_impl(*args, node=node)

    register_op(name, infer=t.infer, np_impl=_np, jax_impl=_jax,
                flops=t.flops)


_alias("nn.fast_softmax", "nn.softmax")
_alias("nn.matmul", "nn.batch_matmul")
