"""Dataset-scale accuracy harness (quantize/accuracy.py + dataset.py) —
the mrt `Trace.eval` analog (`/root/reference/python/tvm/mrt/api.py:98`,
`mrt/dataset.py`): REAL labeled data (sklearn's bundled digits), a REAL
trained model (tests/fixtures/digits_cnn.npz, scripts/make_digits_fixture
.py), top-1/top-5 accuracy vs labels and float-vs-int8 agreement per
calibration mode."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tachikoma_tpu.models import digits_cnn
from tachikoma_tpu.quantize.accuracy import compare_calibrations, eval_topk
from tachikoma_tpu.quantize.dataset import (Dataset, digits, from_npz,
                                            get_dataset, synthetic_images)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "digits_cnn.npz")


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------

def test_digits_dataset_shapes_and_split():
    ds = digits()
    assert ds.data.shape == (1797, 8, 8, 1) and ds.labels.shape == (1797,)
    assert ds.data.min() >= 0.0 and ds.data.max() <= 1.0
    calib, ev = ds.split(100)
    assert len(calib) == 100 and len(ev) == 1697
    assert np.array_equal(calib.labels, ds.labels[:100])


def test_batches_pad_last_and_report_valid():
    ds = Dataset(np.arange(10, dtype=np.float32).reshape(10, 1), None)
    chunks = list(ds.batches(4))
    assert [v for _, v in chunks] == [4, 4, 2]
    assert chunks[-1][0].shape == (4, 1)
    # padded rows repeat the first sample of the short batch
    assert chunks[-1][0][2, 0] == chunks[-1][0][0, 0] == 8.0


def test_synthetic_images_deterministic():
    a = synthetic_images(4, (16, 16, 3), seed=3)
    b = synthetic_images(4, (16, 16, 3), seed=3)
    assert np.array_equal(a.data, b.data)
    assert a.data.shape == (4, 16, 16, 3) and a.labels is None
    # non-degenerate statistics
    assert a.data.std() > 0.3


def test_npz_roundtrip(tmp_path):
    p = str(tmp_path / "d.npz")
    np.savez(p, data=np.ones((5, 2), np.float32), labels=np.arange(5))
    ds = from_npz(p)
    assert len(ds) == 5 and ds.labels[3] == 3
    assert get_dataset(p, (1, 2)).name == p


# ---------------------------------------------------------------------------
# accuracy harness on the real trained model
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def digits_setup():
    g = digits_cnn(FIXTURE, batch_size=64)
    # the fixture was trained on samples [512:]; evaluate on the held-out head
    head = digits().split(512)[0]
    return g, head


def test_digits_cnn_float_accuracy(digits_setup):
    g, head = digits_setup
    rep = eval_topk(g, g, head, executor="oracle", limit=256,
                    name="identity")
    # real trained model on held-out labeled data
    assert rep.top1_float is not None and rep.top1_float >= 0.93
    assert rep.top5_float >= 0.99
    assert rep.top1_agree == 1.0  # graph vs itself


def test_int8_accuracy_tracks_float_per_mode(digits_setup):
    g, head = digits_setup
    reps = compare_calibrations(g, head, modes=("max", "percentile", "kl"),
                                calib_samples=64, executor="jax", limit=256)
    assert [r.name for r in reps] == ["max", "percentile", "kl"]
    for r in reps:
        assert r.n >= 192
        assert r.top1_agree >= 0.95, r.row()
        assert r.top5_agree >= 0.99, r.row()
        # int8 accuracy within 2 points of float on real labels
        assert r.top1_quant >= r.top1_float - 0.02, r.row()


def test_cli_evaluate_dataset(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "tachikoma_tpu.cli", "evaluate", "digits_cnn",
         "--dataset", "digits", "--modes", "max", "--samples", "128",
         "--calib-samples", "64", "--batch", "64"],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "agree top1" in out.stdout and "max" in out.stdout
