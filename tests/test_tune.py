"""Autotuner + database tests (CPU interpret mode; same paths run on TPU)."""

import numpy as np
import pytest

from tachikoma_tpu.tune.database import (
    COMPILE_ERROR,
    NO_ERROR,
    TuneDatabase,
    TuneRecord,
    apply_history_best,
    lookup_config,
)
from tachikoma_tpu.tune.tuner import matmul_workload, tune_matmul


def test_database_roundtrip(tmp_path):
    path = str(tmp_path / "tune.jsonl")
    db = TuneDatabase(path)
    db.add(TuneRecord("w1", {"blocks": [512, 512, 512]}, 1.5))
    db.add(TuneRecord("w1", {"blocks": [512, 512, 1024]}, 1.1))
    db.add(TuneRecord("w1", {"blocks": [256, 256, 256]}, float("inf"), COMPILE_ERROR, "boom"))
    db.add(TuneRecord("w2", {"blocks": [128, 128, 128]}, 0.3))
    assert db.best("w1").config == {"blocks": [512, 512, 1024]}
    # resume from disk
    db2 = TuneDatabase(path)
    assert len(db2) == 4
    assert db2.best("w1").time_ms == 1.1
    assert db2.best_config("w2") == {"blocks": [128, 128, 128]}
    assert db2.best("nope") is None


def test_apply_history_best(tmp_path):
    db = TuneDatabase()
    db.add(TuneRecord("wl", {"blocks": [1, 2, 3]}, 1.0))
    assert lookup_config("wl") is None
    with apply_history_best(db):
        assert lookup_config("wl") == {"blocks": [1, 2, 3]}
        assert lookup_config("other") is None
    assert lookup_config("wl") is None


def test_failed_trials_are_data():
    db = TuneDatabase()
    db.add(TuneRecord("w", {"blocks": [9, 9, 9]}, float("inf"), COMPILE_ERROR))
    assert db.best("w") is None  # errors never become best
    db.add(TuneRecord("w", {"blocks": [2, 2, 2]}, 5.0, NO_ERROR))
    assert db.best("w").time_ms == 5.0


@pytest.mark.slow
def test_tune_matmul_small(tmp_path):
    db = TuneDatabase(str(tmp_path / "t.jsonl"))
    best = tune_matmul(128, 256, 128, db, fused=False,
                       candidates=[(128, 128, 128), (128, 128, 256)], verbose=False)
    assert best is not None and best.error_no == NO_ERROR
    assert matmul_workload(128, 256, 128, False) in db.workloads()
