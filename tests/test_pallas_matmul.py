"""Pallas int8 matmul kernel — bit-exact vs the oracle, plus fused-executor
integration (interpret mode on CPU; same code compiles for TPU)."""

import numpy as np
import pytest

from tachikoma_tpu.ops.fixed_point import requantize_np
from tachikoma_tpu.ops.pallas.matmul_int8 import qmatmul_int8
from tachikoma_tpu.ops.pallas.qms32 import plan_requantize


@pytest.mark.parametrize("shape", [(128, 256, 128), (100, 200, 72), (32, 128, 640)])
@pytest.mark.parametrize("rounding", ["UPWARD", "TONEAREST"])
def test_qmatmul_fused_bitexact(rng, shape, rounding):
    M, K, N = shape
    x = rng.integers(-127, 127, (M, K)).astype(np.int8)
    w = rng.integers(-127, 127, (K, N)).astype(np.int8)
    bias = rng.integers(-5000, 5000, N).astype(np.int32)
    scales = 0.0001 + np.abs(rng.standard_normal(N)) * 0.0005
    m_arr, s_arr = plan_requantize(scales, 0.05)
    out = np.asarray(
        qmatmul_int8(
            x, w, bias=bias, multiplier=m_arr, shift=s_arr,
            out_zp=-3, rounding=rounding, blocks=(32, 128, 128),
        )
    )
    acc = (x.astype(np.int64) @ w.astype(np.int64) + bias).astype(np.int32)
    want = requantize_np(acc, scales, 0, 0.05, -3, axis=1, rounding=rounding, out_dtype="int8")
    np.testing.assert_array_equal(out, want)


def test_qmatmul_scalar_multiplier(rng):
    M, K, N = 64, 128, 128
    x = rng.integers(-127, 127, (M, K)).astype(np.int8)
    w = rng.integers(-127, 127, (K, N)).astype(np.int8)
    m, s = plan_requantize(0.0004, 0.1)
    out = np.asarray(
        qmatmul_int8(x, w, multiplier=m, shift=s, blocks=(32, 128, 128))
    )
    acc = (x.astype(np.int64) @ w.astype(np.int64)).astype(np.int32)
    want = requantize_np(acc, 0.0004, 0, 0.1, 0, out_dtype="int8")
    np.testing.assert_array_equal(out, want)


def test_qmatmul_raw_int32(rng):
    M, K, N = 64, 96, 40
    x = rng.integers(-127, 127, (M, K)).astype(np.int8)
    w = rng.integers(-127, 127, (K, N)).astype(np.int8)
    out = np.asarray(qmatmul_int8(x, w, blocks=(32, 128, 128)))
    want = (x.astype(np.int64) @ w.astype(np.int64)).astype(np.int32)
    np.testing.assert_array_equal(out, want)


def test_fused_executor_uses_pallas_semantics(rng):
    """Full fused LeNet runs through JaxExecutor(fuse=True) and stays
    bit-identical to the unfused oracle."""
    from tachikoma_tpu import run_graph
    from tachikoma_tpu.models.vision import lenet5
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.runtime.executor import JaxExecutor

    g = lenet5(batch_size=2)
    data = [rng.standard_normal((2, 28, 28, 1)).astype(np.float32) for _ in range(2)]
    qg = quantize(g, data)
    want = run_graph(qg, data[0])[0]
    got = JaxExecutor(qg, fuse=True).run(data[0])[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_fuse_preserves_output_names(rng):
    from tachikoma_tpu.models.vision import lenet5
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.runtime.fuse import fuse_qnn

    g = lenet5(batch_size=1)
    data = [rng.standard_normal((1, 28, 28, 1)).astype(np.float32) for _ in range(2)]
    qg = quantize(g, data)
    fg = fuse_qnn(qg)
    assert fg.outputs == qg.outputs
    assert any(n.op == "tk.conv2d_rq" for n in fg.nodes)
    assert any(n.op == "tk.dense_rq" for n in fg.nodes)
    assert not any(n.op == "qnn.requantize" and "relu" in n.name for n in fg.nodes)
