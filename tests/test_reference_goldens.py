"""Reference-authored golden vectors, ported verbatim.

Every array below is lifted from the reference fork's own test suite, so
"matches the reference" is evidenced by reference-authored data rather than
by our re-derivation of requantize.cc:

  /root/reference/tests/python/relay/test_op_qnn_requantize.py
  /root/reference/tests/python/relay/test_op_qnn_add.py
  /root/reference/tests/python/relay/test_op_qnn_concatenate.py
  /root/reference/tests/python/relay/test_op_qnn_mul.py (procedure-derived)

Each vector is asserted with exact `==` on BOTH execution paths (numpy
oracle and the XLA executor); scalar-scale requantize cases additionally
pin the Pallas epilogue primitive (plan_requantize + q_multiply_shift_u32,
the exact path fused kernels run on-chip).
"""

import jax
import numpy as np
import pytest

from tachikoma_tpu import GraphBuilder, infer_types, run_graph
from tachikoma_tpu.ops.pallas.qms32 import (plan_requantize,
                                            q_multiply_shift_u32)
from tachikoma_tpu.runtime.executor import run_graph_jax

ROUNDINGS = ("UPWARD", "TONEAREST")


def _run_both(build, feeds):
    """Build graph, run oracle + XLA, assert they agree, return oracle out."""
    b = GraphBuilder()
    out = build(b)
    g = infer_types(b.build(out))
    o = np.asarray(run_graph(g, feeds)[0])
    j = np.asarray(run_graph_jax(g, feeds)[0])
    assert (o == j).all(), "oracle vs XLA disagree"
    return o


def _requantize(data, in_scale, out_scale, izp=0, ozp=0, rounding="UPWARD",
                in_dtype="int32", out_dtype="int8", axis=-1):
    def build(b):
        x = b.var("x", data.shape, in_dtype)
        return b.call("qnn.requantize", x, input_scale=in_scale,
                      output_scale=out_scale, input_zero_point=izp,
                      output_zero_point=ozp, rounding=rounding,
                      out_dtype=out_dtype, axis=axis)

    got = _run_both(build, {"x": data.astype(in_dtype)})

    # Pallas epilogue primitive (scalar-scale, int32 input only): the exact
    # integer sequence fused kernels execute on-chip
    if (np.ndim(in_scale) == 0 and in_dtype == "int32"
            and out_dtype == "int8"):
        m, s = plan_requantize(float(in_scale), float(out_scale))
        acc = data.astype(np.int32) - np.int32(izp)
        v = jax.jit(
            lambda a: q_multiply_shift_u32(a, m, s, rounding))(acc)
        v = np.asarray(v) + np.int32(ozp)
        p = np.clip(v, -128, 127).astype(np.int8)
        assert (p == got).all(), "Pallas epilogue path disagrees"
    return got


# ---------------------------------------------------------------------------
# requantize goldens (test_op_qnn_requantize.py:82-515)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("rounding", ROUNDINGS)
def test_requantize_same_scale(rounding):
    golden_data = np.arange(-100, 100, 1).astype(np.int32)
    got = _requantize(golden_data, 0.5, 0.5, rounding=rounding)
    np.testing.assert_array_equal(got, golden_data.astype(np.int8))


@pytest.mark.parametrize("rounding", ROUNDINGS)
def test_requantize_scalar_same_scale(rounding):
    golden_data = np.array(-10).astype(np.int32)
    got = _requantize(golden_data, 0.5, 0.5, rounding=rounding)
    np.testing.assert_array_equal(got, golden_data.astype(np.int8))


@pytest.mark.parametrize("rounding", ROUNDINGS)
def test_requantize_downscale_16(rounding):
    # positive: 8 corresponds to 0.5, resulting in 1
    golden_data = np.arange(0, 32, 1).astype(np.int32)
    got = _requantize(golden_data, 1, 16, rounding=rounding)
    np.testing.assert_array_equal(got, np.repeat([0, 1, 2], [8, 16, 8]))
    # negative: -8 is -0.5; UPWARD rounds it to 0
    golden_data = np.arange(0, -32, -1).astype(np.int32)
    got = _requantize(golden_data, 1, 16, rounding=rounding)
    if rounding == "UPWARD":
        want = np.repeat([0, -1, -2], [9, 16, 7])
    else:
        want = np.repeat([0, -1, -2], [8, 16, 8])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("rounding", ROUNDINGS)
def test_requantize_downscale_4(rounding):
    golden_data = np.arange(0, 32, 1).astype(np.int32)
    got = _requantize(golden_data, 1, 4, rounding=rounding)
    np.testing.assert_array_equal(
        got, np.repeat([0, 1, 2, 3, 4, 5, 6, 7, 8],
                       [2, 4, 4, 4, 4, 4, 4, 4, 2]))
    golden_data = np.arange(0, -32, -1).astype(np.int32)
    got = _requantize(golden_data, 1, 4, rounding=rounding)
    if rounding == "UPWARD":
        want = np.repeat([0, -1, -2, -3, -4, -5, -6, -7, -8],
                         [3, 4, 4, 4, 4, 4, 4, 4, 1])
    else:
        want = np.repeat([0, -1, -2, -3, -4, -5, -6, -7, -8],
                         [2, 4, 4, 4, 4, 4, 4, 4, 2])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("rounding", ROUNDINGS)
def test_requantize_downscale_uint8(rounding):
    golden_data = np.arange(0, 32, 1).astype(np.int32)
    got = _requantize(golden_data, 1, 16, rounding=rounding,
                      out_dtype="uint8")
    np.testing.assert_array_equal(got, np.repeat([0, 1, 2], [8, 16, 8]))
    got = _requantize(golden_data, 1, 16, rounding=rounding,
                      in_dtype="uint8", out_dtype="uint8")
    np.testing.assert_array_equal(got, np.repeat([0, 1, 2], [8, 16, 8]))


@pytest.mark.parametrize("rounding", ROUNDINGS)
def test_requantize_upscale(rounding):
    golden_data = np.arange(0, 32, 1).astype(np.int32)
    got = _requantize(golden_data, 2, 1, rounding=rounding)
    np.testing.assert_array_equal(got, (2 * golden_data).astype(np.int8))
    golden_data = np.arange(0, -32, -1).astype(np.int32)
    got = _requantize(golden_data, 2, 1, rounding=rounding)
    np.testing.assert_array_equal(got, (2 * golden_data).astype(np.int8))


@pytest.mark.parametrize("rounding", ROUNDINGS)
def test_requantize_non_power_of_two(rounding):
    golden_data = (np.arange(0, 32, 1) * 3).astype(np.int32)
    got = _requantize(golden_data, 1, 3, rounding=rounding)
    np.testing.assert_array_equal(got, np.arange(0, 32, 1))
    golden_data = (np.arange(0, -32, -1) * 3).astype(np.int32)
    got = _requantize(golden_data, 1, 3, rounding=rounding)
    np.testing.assert_array_equal(got, np.arange(0, -32, -1))
    golden_data = np.arange(0, 32, 1).astype(np.int32)
    got = _requantize(golden_data, 3, 1, rounding=rounding)
    np.testing.assert_array_equal(got, golden_data * 3)
    golden_data = np.arange(0, -32, -1).astype(np.int32)
    got = _requantize(golden_data, 3, 1, rounding=rounding)
    np.testing.assert_array_equal(got, golden_data * 3)


@pytest.mark.parametrize("rounding", ROUNDINGS)
def test_requantize_saturation(rounding):
    golden_data = (120 + np.arange(0, 16, 1)).astype(np.int32)
    got = _requantize(golden_data, 0.5, 0.5, rounding=rounding)
    np.testing.assert_array_equal(
        got, np.array([120, 121, 122, 123, 124, 125, 126, 127, 127, 127,
                       127, 127, 127, 127, 127, 127]))
    golden_data = (-120 + np.arange(0, -16, -1)).astype(np.int32)
    got = _requantize(golden_data, 0.5, 0.5, rounding=rounding)
    np.testing.assert_array_equal(
        got, np.array([-120, -121, -122, -123, -124, -125, -126, -127,
                       -128, -128, -128, -128, -128, -128, -128, -128]))


@pytest.mark.parametrize("rounding", ROUNDINGS)
def test_requantize_output_zero_point(rounding):
    golden_data = np.arange(0, 32, 1).astype(np.int32)
    got = _requantize(golden_data, 1, 16, ozp=1, rounding=rounding)
    np.testing.assert_array_equal(got, 1 + np.repeat([0, 1, 2], [8, 16, 8]))
    golden_data = np.arange(-32, -64, -1).astype(np.int32)
    got = _requantize(golden_data, 1, 16, ozp=1, rounding=rounding)
    if rounding == "UPWARD":
        want = np.repeat([-2, -3, -4], [9, 16, 7])
    else:
        want = np.repeat([-2, -3, -4], [8, 16, 8])
    np.testing.assert_array_equal(got, 1 + want)


@pytest.mark.parametrize("rounding", ROUNDINGS)
def test_requantize_input_zero_point(rounding):
    golden_data = np.arange(32, 64, 1).astype(np.int32)
    got = _requantize(golden_data, 1, 16, izp=16, rounding=rounding)
    np.testing.assert_array_equal(got,
                                  np.repeat([2, 3, 4], [8, 16, 8]) - 1)
    golden_data = np.arange(-32, -64, -1).astype(np.int32)
    got = _requantize(golden_data, 1, 16, izp=16, rounding=rounding)
    if rounding == "UPWARD":
        want = np.repeat([-2, -3, -4], [9, 16, 7])
    else:
        want = np.repeat([-2, -3, -4], [8, 16, 8])
    np.testing.assert_array_equal(got, want - 1)


@pytest.mark.parametrize("rounding", ROUNDINGS)
def test_requantize_per_channel_same_scale(rounding):
    golden_data = np.arange(-5, 5, 1).astype(np.int32).reshape((5, 2))
    got = _requantize(golden_data, [0.5, 0.5], 0.5, axis=1,
                      rounding=rounding)
    np.testing.assert_array_equal(got, golden_data.astype(np.int8))
    golden_data = np.arange(-10, 10, 1).astype(np.int32).reshape((2, 2, 5))
    got = _requantize(golden_data, [0.5, 0.5], 0.5, axis=1,
                      rounding=rounding)
    np.testing.assert_array_equal(got, golden_data.astype(np.int8))


@pytest.mark.parametrize("rounding", ROUNDINGS)
def test_requantize_per_channel_different_scale(rounding):
    golden_data = np.arange(-5, 5, 1).astype(np.int32).reshape((5, 2))
    got = _requantize(golden_data, [0.5, 0.25], 0.5, axis=1,
                      rounding=rounding)
    np.testing.assert_array_equal(
        got, np.array([-5, -2, -3, -1, -1, 0, 1, 1, 3, 2],
                      np.int8).reshape((5, 2)))
    golden_data = np.arange(-20, 20, 2).astype(np.int32).reshape((2, 2, 5))
    got = _requantize(golden_data, [0.5, 0.25], 0.5, axis=1,
                      rounding=rounding)
    np.testing.assert_array_equal(
        got, np.array([-20, -18, -16, -14, -12, -5, -4, -3, -2, -1,
                       0, 2, 4, 6, 8, 5, 6, 7, 8, 9],
                      np.int8).reshape((2, 2, 5)))
    golden_data = np.arange(-5, 5, 1).astype(np.int32).reshape((5, 2))
    got = _requantize(golden_data, [1.0, 0.25], 0.5, axis=1,
                      rounding=rounding)
    np.testing.assert_array_equal(
        got, np.array([-10, -2, -6, -1, -2, 0, 2, 1, 6, 2],
                      np.int8).reshape((5, 2)))


def test_requantize_default_rounding_is_upward():
    # test_default_cfg_and_no_args: default rounding must behave as UPWARD
    golden_data = np.arange(0, -32, -1).astype(np.int32)

    def build(b):
        x = b.var("x", golden_data.shape, "int32")
        return b.call("qnn.requantize", x, input_scale=1, output_scale=16,
                      out_dtype="int8")

    got = _run_both(build, {"x": golden_data})
    np.testing.assert_array_equal(got, np.repeat([0, -1, -2], [9, 16, 7]))


# ---------------------------------------------------------------------------
# qnn.add goldens (test_op_qnn_add.py:23-118 tflite cases, :121-232 saturation)
# ---------------------------------------------------------------------------

def _qnn_add(x, y, params, out_dtype="uint8"):
    def build(b):
        xv = b.var("x", x.shape, out_dtype)
        yv = b.var("y", y.shape, out_dtype)
        return b.call("qnn.add", xv, yv, out_dtype=out_dtype, **params)

    return _run_both(build, {"x": x.astype(out_dtype),
                             "y": y.astype(out_dtype)})


def test_qnn_add_tflite_same_io_params():
    p = dict(lhs_scale=0.00784314, lhs_zero_point=127,
             rhs_scale=0.00784314, rhs_zero_point=127,
             output_scale=0.00784314, output_zero_point=127)
    x_datas = [np.array((140, 153, 165, 178)).reshape((1, 4)),
               np.array((25, 153, 178, 216)).reshape((1, 4)),
               np.array((25, 153, 216, 165)).reshape((1, 4))]
    y_datas = [np.array((204, 178, 165, 140)).reshape((1, 4)),
               np.array((204, 178, 191, 25)).reshape((1, 4)),
               np.array((204, 178, 25, 191)).reshape((1, 4))]
    goldens = [np.array((217, 204, 203, 191)).reshape((1, 4)),
               np.array((102, 204, 242, 114)).reshape((1, 4)),
               np.array((102, 204, 114, 229)).reshape((1, 4))]
    for x, y, want in zip(x_datas, y_datas, goldens):
        np.testing.assert_array_equal(_qnn_add(x, y, p), want)


def test_qnn_add_tflite_different_io_params():
    p = dict(lhs_scale=0.0156863, lhs_zero_point=127,
             rhs_scale=0.0117647, rhs_zero_point=85,
             output_scale=0.0235294, output_zero_point=128)
    x_datas = [np.array((76, 140, 153, 172)).reshape((1, 4)),
               np.array((133, 140, 146, 153)).reshape((1, 4)),
               np.array((76, 140, 172, 146)).reshape((1, 4))]
    y_datas = [np.array((136, 119, 128, 17)).reshape((1, 4)),
               np.array((136, 119, 111, 94)).reshape((1, 4)),
               np.array((136, 119, 17, 128)).reshape((1, 4))]
    goldens = [np.array((120, 154, 167, 124)).reshape((1, 4)),
               np.array((158, 154, 154, 150)).reshape((1, 4)),
               np.array((120, 154, 124, 163)).reshape((1, 4))]
    for x, y, want in zip(x_datas, y_datas, goldens):
        np.testing.assert_array_equal(_qnn_add(x, y, p), want)


def test_qnn_add_saturation():
    # same params: saturates at uint8 max
    p = dict(lhs_scale=0.125, lhs_zero_point=0, rhs_scale=0.125,
             rhs_zero_point=0, output_scale=0.125, output_zero_point=0)
    got = _qnn_add(np.array((255, 1, 1, 0)).reshape((1, 4)),
                   np.array((255, 255, 128, 0)).reshape((1, 4)), p)
    np.testing.assert_array_equal(
        got, np.array((255, 255, 129, 0)).reshape((1, 4)))
    # different output scale
    p = dict(lhs_scale=0.125, lhs_zero_point=0, rhs_scale=0.125,
             rhs_zero_point=0, output_scale=0.25, output_zero_point=0)
    got = _qnn_add(np.array((255, 1, 1, 0)).reshape((1, 4)),
                   np.array((255, 255, 127, 0)).reshape((1, 4)), p)
    np.testing.assert_array_equal(
        got, np.array((255, 129, 65, 0)).reshape((1, 4)))
    # all params different
    p = dict(lhs_scale=0.5, lhs_zero_point=0, rhs_scale=0.25,
             rhs_zero_point=0, output_scale=0.125, output_zero_point=0)
    got = _qnn_add(np.array((255, 0, 1, 0)).reshape((1, 4)),
                   np.array((0, 128, 64, 0)).reshape((1, 4)), p)
    np.testing.assert_array_equal(
        got, np.array((255, 255, 132, 0)).reshape((1, 4)))


# ---------------------------------------------------------------------------
# qnn.concatenate goldens (test_op_qnn_concatenate.py:26-160)
# ---------------------------------------------------------------------------

def _qnn_concat(x, y, xs, ys, xz, yz, os_, oz):
    def build(b):
        xv = b.var("x", x.shape, "int32")
        yv = b.var("y", y.shape, "int32")
        return b.call("qnn.concatenate", xv, yv, axis=1,
                      input_scales=(xs, ys), input_zero_points=(xz, yz),
                      output_scale=os_, output_zero_point=oz,
                      out_dtype="int32")

    return _run_both(build, {"x": x, "y": y})


def test_qnn_concatenate_goldens():
    s = (62 + 64) / (np.power(2, 32) - 1.0)
    x = np.arange(-32, 32, 1).reshape(1, 64).astype(np.int32)
    y = np.arange(-64, 64, 2).reshape(1, 64).astype(np.int32)
    # same io params
    got = _qnn_concat(x, y, s, s, 0, 0, s, 0)
    np.testing.assert_array_equal(got, np.concatenate((x, y), axis=1))
    # different io params
    got = _qnn_concat(x, y, s, s, 3, 4, s, 1)
    np.testing.assert_array_equal(got,
                                  np.concatenate((x - 2, y - 3), axis=1))
    # few same io params
    got = _qnn_concat(x, y, s, s, 0, 1, s, 1)
    np.testing.assert_array_equal(got,
                                  np.concatenate((x + 1, y), axis=1))
    # same input params, different output zp
    got = _qnn_concat(x, y, s, s, 0, 0, s, 1)
    np.testing.assert_array_equal(got,
                                  np.concatenate((x + 1, y + 1), axis=1))


# ---------------------------------------------------------------------------
# qnn.mul goldens (test_op_qnn_mul.py — reference derives goldens with its
# recover/generate_golden_output procedure; reproduced verbatim here)
# ---------------------------------------------------------------------------

def _mul_golden(x, y, lhs_scale, lhs_zp, rhs_scale, rhs_zp, out_scale,
                out_zp):
    xr = lhs_scale * (np.asarray(x) - lhs_zp)
    yr = rhs_scale * (np.asarray(y) - rhs_zp)
    out = np.around(xr * yr / out_scale + out_zp)
    return np.clip(out, 0, 255).astype(np.uint8)


def test_qnn_mul_tflite_same_io_params():
    sc, zp = 0.00784314, 127
    p = dict(lhs_scale=sc, lhs_zero_point=zp, rhs_scale=sc,
             rhs_zero_point=zp, output_scale=sc, output_zero_point=zp)
    x_datas = [np.array((1, 153, 2, 178)).reshape((1, 4)),
               np.array((25, 1, 178, 216)).reshape((1, 4)),
               np.array((25, 153, 1, 165)).reshape((1, 4))]
    y_datas = [np.array((204, 178, 1, 8)).reshape((1, 4)),
               np.array((204, 178, 191, 1)).reshape((1, 4)),
               np.array((204, 178, 1, 191)).reshape((1, 4))]
    for x, y in zip(x_datas, y_datas):
        def build(b):
            xv = b.var("x", x.shape, "uint8")
            yv = b.var("y", y.shape, "uint8")
            return b.call("qnn.mul", xv, yv, out_dtype="uint8", **p)

        got = _run_both(build, {"x": x.astype(np.uint8),
                                "y": y.astype(np.uint8)})
        want = _mul_golden(x, y, sc, zp, sc, zp, sc, zp)
        np.testing.assert_array_equal(got, want)
