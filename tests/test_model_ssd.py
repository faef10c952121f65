"""SSD-lite detection model: build, oracle==XLA parity, quantization.

The detection-graph end-to-end check (reference role: SSD imports through
`vision.multibox_transform_loc` + `vision.non_max_suppression`,
`src/relay/op/vision/{multibox_op.cc,nms.cc}`)."""

import numpy as np

from tachikoma_tpu import run_graph
from tachikoma_tpu.models import ssd_lite
from tachikoma_tpu.quantize.quantizer import quantize
from tachikoma_tpu.runtime.executor import JaxExecutor


def _build(image_size=160):
    rng = np.random.default_rng(0)
    g = ssd_lite(batch_size=1, image_size=image_size)
    x = rng.standard_normal((1, image_size, image_size, 3)).astype(np.float32)
    return g, x


def test_ssd_builds_and_runs():
    g, x = _build()
    boxes, scores, keep = run_graph(g, x)
    npri = boxes.shape[1]
    assert boxes.shape == (1, npri, 4)
    assert scores.shape == (1, npri)
    assert keep.shape == (1, 100) and keep.dtype == np.int32
    valid = keep[0][keep[0] >= 0]
    assert valid.size > 0 and valid.max() < npri
    assert len(set(valid.tolist())) == valid.size  # no duplicate picks


def test_ssd_oracle_vs_jax():
    g, x = _build()
    ob, os_, okeep = run_graph(g, x)
    jb, js, jkeep = (np.asarray(a) for a in JaxExecutor(g).run(x))
    # ~30 float conv layers accumulate backend-order differences
    np.testing.assert_allclose(ob, jb, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(os_, js, rtol=1e-3, atol=1e-4)
    # NMS picks agree except possibly at float near-ties: require high overlap
    a, b = set(okeep[0][okeep[0] >= 0].tolist()), set(jkeep[0][jkeep[0] >= 0].tolist())
    inter = len(a & b)
    assert inter >= 0.9 * max(len(a), len(b))


def test_ssd_quantizes():
    g, x = _build()
    fb, fs, _ = run_graph(g, x)
    qg = quantize(g, [x])
    assert any(n.op == "qnn.conv2d" for n in qg.nodes)
    qb, qs, qkeep = run_graph(qg, x)
    assert qb.shape == fb.shape and qs.shape == fs.shape
    # the box-regression path is near-linear in the conv outputs -> a robust
    # quantization-fidelity signal; softmax'd random-weight class scores are
    # noise-dominated, so only require a weak positive correlation there
    bcorr = np.corrcoef(fb.ravel(), qb.ravel())[0, 1]
    scorr = np.corrcoef(fs.ravel(), qs.ravel())[0, 1]
    assert bcorr > 0.9, f"box corr {bcorr}"
    assert scorr > 0.3, f"score corr {scorr}"
