"""image.resize2d coordinate-mode semantics (round-2 advisor finding:
op_Resize ignored coordinate_transformation_mode/nearest_mode; ONNX
opset-11+ defaults are half_pixel + round_prefer_floor).

Oracle: torch.nn.functional.interpolate for the modes it implements, plus
numpy==jax bitwise for every mode (indices are static, both backends gather
identically).
"""

import numpy as np
import pytest

from tachikoma_tpu import GraphBuilder, infer_types, run_graph
from tachikoma_tpu.runtime.executor import run_graph_jax


def _resize(x, **attrs):
    b = GraphBuilder()
    v = b.var("x", x.shape, str(x.dtype))
    g = infer_types(b.build(b.call("image.resize2d", v, **attrs)))
    o = run_graph(g, x)[0]
    j = run_graph_jax(g, x)[0]
    if x.dtype.kind in "iu":
        assert (np.asarray(o) == np.asarray(j)).all()
    else:
        np.testing.assert_allclose(o, j, rtol=1e-6, atol=1e-6)
    return np.asarray(o)


@pytest.mark.parametrize("size", [(8, 8), (7, 5), (3, 9)])
def test_nearest_half_pixel_matches_torch(rng, size):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((2, 4, 6, 3)).astype(np.float32)
    # torch "nearest-exact" = half_pixel coords + floor(x+0.5) rounding,
    # i.e. ONNX round_prefer_ceil — compare that mode exactly
    got = _resize(x, size=size, method="nearest_neighbor",
                  coordinate_transformation_mode="half_pixel",
                  rounding_method="round_prefer_ceil")
    want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         size=size, mode="nearest-exact")
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(got, want)


def test_nearest_round_prefer_floor_tie():
    """ONNX default tie rounding: source coord exactly .5 goes DOWN."""
    x = np.arange(6, dtype=np.float32).reshape(1, 1, 6, 1)
    x = np.broadcast_to(x, (1, 2, 6, 1)).copy()
    got = _resize(x, size=(2, 9), method="nearest_neighbor",
                  coordinate_transformation_mode="half_pixel",
                  rounding_method="round_prefer_floor")
    # width 6->9: xin = (i+0.5)*2/3 - 0.5 = [.167,.833,1.5,2.167,...]
    # i=2 -> 1.5 tie -> 1 (prefer floor); prefer-ceil would give 2
    assert got[0, 0, 2, 0] == 1.0


def test_nearest_asymmetric_floor_legacy(rng):
    # the pre-fix behavior (TVM default) must be expressible and unchanged
    x = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    got = _resize(x, size=(8, 8), method="nearest_neighbor",
                  coordinate_transformation_mode="asymmetric",
                  rounding_method="floor")
    ys = np.minimum((np.arange(8) * 4) // 8, 3)
    want = x[:, ys][:, :, ys]
    np.testing.assert_array_equal(got, want)


def test_nearest_int8_exact(rng):
    x = rng.integers(-128, 127, (1, 5, 7, 4)).astype(np.int8)
    got = _resize(x, size=(10, 14), method="nearest_neighbor",
                  coordinate_transformation_mode="half_pixel",
                  rounding_method="round_prefer_floor")
    assert got.dtype == np.int8 and got.shape == (1, 10, 14, 4)


@pytest.mark.parametrize("ctm,torch_kw", [
    ("half_pixel", dict(mode="bilinear", align_corners=False)),
    ("align_corners", dict(mode="bilinear", align_corners=True)),
])
def test_linear_matches_torch(rng, ctm, torch_kw):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    got = _resize(x, size=(11, 4), method="linear",
                  coordinate_transformation_mode=ctm)
    want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         size=(11, 4), **torch_kw)
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_linear_int_input_rejected(rng):
    x = rng.integers(-128, 127, (1, 4, 4, 2)).astype(np.int8)
    with pytest.raises(NotImplementedError):
        _resize(x, size=(8, 8), method="linear",
                coordinate_transformation_mode="half_pixel")


def test_onnx_resize_passes_modes_through(rng):
    from tachikoma_tpu.frontend.onnx import from_onnx
    from tests.test_frontend_onnx import make_model, node

    model = make_model(
        nodes=[node("Resize", ["x", "", "", "sizes"], ["y"], mode="nearest",
                    coordinate_transformation_mode="half_pixel",
                    nearest_mode="round_prefer_ceil")],
        inputs={"x": (1, 3, 4, 4)},
        outputs={"y": (1, 3, 8, 8)},
        initializers={"sizes": np.asarray([1, 3, 8, 8], np.int64)},
    )
    g = from_onnx(model)
    rz = [n for n in g.nodes if n.op == "image.resize2d"]
    assert rz and rz[0].attrs["coordinate_transformation_mode"] == "half_pixel"
    assert rz[0].attrs["rounding_method"] == "round_prefer_ceil"
    x = rng.standard_normal((1, 3, 4, 4)).astype(np.float32)
    import torch
    import torch.nn.functional as F

    got = run_graph(g, {"x": x})[0]  # frontend coerces outputs to NCHW
    want = F.interpolate(torch.from_numpy(x), size=(8, 8),
                         mode="nearest-exact").numpy()
    np.testing.assert_array_equal(got, want)


def test_bucketed_aggregate_output_guard(rng):
    """Padding policy must refuse outputs with no batch axis (advisor: a
    scalar loss computed over padded rows was silently wrong)."""
    from tachikoma_tpu.runtime.bucketed import BucketedExecutor

    b = GraphBuilder()
    x = b.var("x", (4, 8), "float32")
    s = b.call("sum", x)  # scalar: aggregates over batch
    g = infer_types(b.build(s))
    ex = BucketedExecutor(g, buckets=(4, 8))
    xin = rng.standard_normal((3, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="aggregate"):
        ex.run(xin)
    # exact bucket size still works
    x4 = rng.standard_normal((4, 8)).astype(np.float32)
    out = ex.run(x4)[0]
    np.testing.assert_allclose(out, x4.sum(), rtol=1e-5)
