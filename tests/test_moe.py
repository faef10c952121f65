"""Expert-parallel MoE dense: bit-exact vs the single-device reference."""

import numpy as np
import pytest

from tachikoma_tpu.parallel.mesh import simple_mesh
from tachikoma_tpu.parallel.moe import (
    moe_dense_int8,
    moe_dense_int8_reference,
    top1_gate,
)


@pytest.mark.parametrize("ep", [2, 4, 8])
def test_moe_bitexact(rng, ep):
    T, K, N, E = 64, 32, 48, 8
    x = rng.integers(-128, 128, (T, K)).astype(np.int8)
    w = rng.integers(-128, 128, (E, K, N)).astype(np.int8)
    gate = rng.integers(0, E, (T,)).astype(np.int32)
    want = moe_dense_int8_reference(x, w, gate)
    mesh = simple_mesh({"ep": ep})
    got = np.asarray(moe_dense_int8(x, w, gate, mesh, axis="ep"))
    np.testing.assert_array_equal(got, want)


def test_moe_router_deterministic(rng):
    T, K, E = 32, 16, 4
    x = rng.integers(-128, 128, (T, K)).astype(np.int8)
    wg = rng.integers(-128, 128, (K, E)).astype(np.int8)
    g1, g2 = top1_gate(x, wg), top1_gate(x, wg)
    np.testing.assert_array_equal(g1, g2)
    assert g1.min() >= 0 and g1.max() < E


def test_moe_all_tokens_covered(rng):
    """Every token gets exactly one expert's contribution (disjoint masks)."""
    T, K, N, E = 16, 8, 8, 4
    x = rng.integers(1, 5, (T, K)).astype(np.int8)  # positive => nonzero out
    w = rng.integers(1, 5, (E, K, N)).astype(np.int8)
    gate = (np.arange(T) % E).astype(np.int32)
    mesh = simple_mesh({"ep": 4})
    out = np.asarray(moe_dense_int8(x, w, gate, mesh))
    assert (out > 0).all()
