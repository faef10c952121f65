"""Secondary op surface: numpy/XLA agreement on the long-tail ops."""

import numpy as np
import pytest

from tachikoma_tpu import GraphBuilder, infer_types, run_graph
from tachikoma_tpu.runtime.executor import JaxExecutor


def both(op, arrays, **attrs):
    b = GraphBuilder()
    names = [b.var(f"in{i}", a.shape, str(a.dtype)) for i, a in enumerate(arrays)]
    out = b.call(op, *names, **attrs)
    g = infer_types(b.build(out))
    ins = {f"in{i}": a for i, a in enumerate(arrays)}
    return run_graph(g, ins), JaxExecutor(g).run(ins)


@pytest.mark.parametrize("op", ["sin", "cos", "tan", "asin", "atan", "sinh",
                                "cosh", "log2", "log10", "trunc"])
def test_unary_agree(rng, op):
    x = (rng.standard_normal((3, 8)) * 0.8).astype(np.float32)
    o, j = both(op, [x])
    np.testing.assert_allclose(o[0], j[0], rtol=1e-5, atol=1e-6)


def test_predicates(rng):
    x = np.array([1.0, np.inf, -np.inf, np.nan, 0.0], dtype=np.float32)
    for op, ref in (("isnan", np.isnan), ("isinf", np.isinf), ("isfinite", np.isfinite)):
        o, j = both(op, [x])
        np.testing.assert_array_equal(o[0], ref(x))
        np.testing.assert_array_equal(j[0], ref(x))


def test_norms(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    gamma = rng.standard_normal(8).astype(np.float32)
    beta = rng.standard_normal(8).astype(np.float32)
    o, j = both("nn.group_norm", [x, gamma, beta], num_groups=2, axis=-1, epsilon=1e-5)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = torch.nn.functional.group_norm(
        tx, 2, torch.from_numpy(gamma), torch.from_numpy(beta), 1e-5
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(o[0], want, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(j[0], want, rtol=1e-3, atol=1e-4)

    o, j = both("nn.instance_norm", [x, gamma, beta], axis=-1, epsilon=1e-5)
    want = torch.nn.functional.instance_norm(
        tx, weight=torch.from_numpy(gamma), bias=torch.from_numpy(beta), eps=1e-5
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(o[0], want, rtol=1e-3, atol=1e-4)

    o, j = both("nn.l2_normalize", [x], axis=(3,))
    denom = np.sqrt((x * x).sum(-1, keepdims=True))
    np.testing.assert_allclose(o[0], x / denom, rtol=1e-5, atol=1e-6)


def test_transforms(rng):
    x = rng.standard_normal((2, 3)).astype(np.float32)
    y = rng.standard_normal((2, 3)).astype(np.float32)
    o, j = both("stack", [x, y], axis=1)
    np.testing.assert_array_equal(o[0], np.stack([x, y], 1))
    np.testing.assert_array_equal(j[0], np.stack([x, y], 1))
    o, j = both("reverse", [x], axis=1)
    np.testing.assert_array_equal(o[0], x[:, ::-1])
    o, j = both("repeat", [x], repeats=2, axis=0)
    np.testing.assert_array_equal(o[0], np.repeat(x, 2, 0))
    xi = rng.integers(-5, 5, (2, 6)).astype(np.int8)
    o, j = both("cumsum", [xi], axis=1)
    np.testing.assert_array_equal(o[0], np.cumsum(xi.astype(np.int32), 1))
    np.testing.assert_array_equal(o[0], j[0])


def test_sort_topk(rng):
    x = rng.standard_normal((3, 10)).astype(np.float32)
    o, j = both("sort", [x], axis=-1)
    np.testing.assert_array_equal(o[0], np.sort(x, -1))
    np.testing.assert_allclose(j[0], np.sort(x, -1))
    o, j = both("argsort", [x], axis=-1)
    np.testing.assert_array_equal(o[0], j[0])

    b = GraphBuilder()
    xn = b.var("x", x.shape, "float32")
    tk = b.call("topk", xn, k=3, axis=-1, ret_type="both")
    v = b.get_item(tk, 0)
    i = b.get_item(tk, 1)
    g = infer_types(b.build([v, i]))
    ov, oi = run_graph(g, {"x": x})
    jv, ji = JaxExecutor(g).run({"x": x})
    want = -np.sort(-x, -1)[:, :3]
    np.testing.assert_allclose(ov, want, rtol=1e-6)
    np.testing.assert_allclose(jv, want, rtol=1e-6)
    np.testing.assert_array_equal(oi, ji)


def test_lrn(rng):
    torch = pytest.importorskip("torch")
    x = np.abs(rng.standard_normal((1, 6, 6, 8))).astype(np.float32)
    o, j = both("nn.lrn", [x], size=5, axis=3, alpha=1e-4, beta=0.75, bias=2.0)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = torch.nn.functional.local_response_norm(tx, 5, alpha=1e-4, beta=0.75, k=2.0)
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(o[0], want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(j[0], want, rtol=1e-4, atol=1e-5)
