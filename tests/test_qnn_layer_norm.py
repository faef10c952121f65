"""qnn.layer_norm — pinned integer semantics: numpy oracle == XLA bitwise,
and close to the float layer norm within quantization tolerance."""

import numpy as np

import tachikoma_tpu.ops.jax_ops  # noqa: F401  (register jax impls)
from tachikoma_tpu.ir.graph import Node
from tachikoma_tpu.ir.registry import get_op
from tachikoma_tpu.ops.qnn import plan_layer_norm


def _make(rng, n_feat=768, shape=(4, 128)):
    x = rng.integers(-128, 128, (*shape, n_feat)).astype(np.int8)
    gamma = rng.standard_normal(n_feat).astype(np.float32)
    beta = (rng.standard_normal(n_feat) * 0.1).astype(np.float32)
    return x, gamma, beta


def test_ln_np_jax_bitexact(rng):
    x, gamma, beta = _make(rng)
    attrs = plan_layer_norm(gamma, beta, 0.05, 3, 0.03, -5, 768)
    attrs["out_dtype"] = "int8"
    node = Node("ln", "qnn.layer_norm", ("x",), attrs)
    got_np = get_op("qnn.layer_norm").np_impl(x, node=node)
    got_jax = np.asarray(get_op("qnn.layer_norm").jax_impl(x, node=node))
    np.testing.assert_array_equal(got_np, got_jax)


def test_ln_matches_float(rng):
    x, gamma, beta = _make(rng, n_feat=512, shape=(8, 16))
    s_x, z_x, s_o, z_o = 0.04, -7, 0.035, 2
    attrs = plan_layer_norm(gamma, beta, s_x, z_x, s_o, z_o, 512)
    attrs["out_dtype"] = "int8"
    node = Node("ln", "qnn.layer_norm", ("x",), attrs)
    got = get_op("qnn.layer_norm").np_impl(x, node=node).astype(np.float64)
    xf = (x.astype(np.float64) - z_x) * s_x
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    ref = (xf - mu) / np.sqrt(var + 1e-12) * gamma + beta
    refq = np.clip(np.rint(ref / s_o) + z_o, -128, 127)
    diff = np.abs(refq - got)
    # beta folds as a pre-rounded integer bias (TFLite-style), so ~half the
    # elements sit one LSB from the jointly-rounded float reference
    assert diff.max() <= 2, diff.max()
    assert diff.mean() < 0.6, diff.mean()


def test_ln_degenerate_rows(rng):
    """Constant rows (zero variance) return the folded beta bias exactly."""
    gamma = np.ones(128, np.float32)
    beta = np.full(128, 0.5, np.float32)
    s_o, z_o = 0.01, 0
    attrs = plan_layer_norm(gamma, beta, 0.05, 0, s_o, z_o, 128)
    attrs["out_dtype"] = "int8"
    node = Node("ln", "qnn.layer_norm", ("x",), attrs)
    x = np.full((3, 128), 17, np.int8)
    got = get_op("qnn.layer_norm").np_impl(x, node=node)
    assert (got == np.clip(round(0.5 / s_o), -128, 127)).all()
    got_jax = np.asarray(get_op("qnn.layer_norm").jax_impl(x, node=node))
    np.testing.assert_array_equal(got, got_jax)


def test_ln_extreme_spread(rng):
    """Full-range rows exercise the int32 headroom bounds (k1/k2 plan)."""
    for n_feat in (64, 768, 1024, 4096):
        x = rng.integers(-128, 128, (2, n_feat)).astype(np.int8)
        x[0, : n_feat // 2] = -128
        x[0, n_feat // 2:] = 127
        gamma = np.ones(n_feat, np.float32)
        beta = np.zeros(n_feat, np.float32)
        attrs = plan_layer_norm(gamma, beta, 0.05, 0, 0.02, 0, n_feat)
        attrs["out_dtype"] = "int8"
        node = Node("ln", "qnn.layer_norm", ("x",), attrs)
        got = get_op("qnn.layer_norm").np_impl(x, node=node).astype(np.float64)
        got_jax = np.asarray(get_op("qnn.layer_norm").jax_impl(x, node=node))
        np.testing.assert_array_equal(got.astype(np.int8), got_jax)
        xf = x.astype(np.float64) * 0.05
        mu = xf.mean(-1, keepdims=True)
        ref = (xf - mu) / np.sqrt(xf.var(-1, keepdims=True) + 1e-12)
        refq = np.clip(np.rint(ref / 0.02), -128, 127)
        assert np.abs(refq - got).max() <= 2
