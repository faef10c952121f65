"""Profiler report tests."""

import json

import numpy as np
import pytest

from tachikoma_tpu.models.vision import lenet5
from tachikoma_tpu.quantize.quantizer import quantize
from tachikoma_tpu.runtime.profiler import profile_graph


@pytest.fixture(scope="module")
def report():
    g = lenet5(batch_size=1)
    rng = np.random.default_rng(0)
    data = [rng.standard_normal((1, 28, 28, 1)).astype(np.float32) for _ in range(2)]
    qg = quantize(g, data)
    return profile_graph(qg, data[0], repeats=2, fuse=True)


def test_report_entries(report):
    assert len(report.entries) > 5
    ops = {e.op for e in report.entries}
    assert "tk.conv2d_rq" in ops
    conv = next(e for e in report.entries if e.op == "tk.conv2d_rq")
    assert conv.flops > 0 and conv.time_s > 0 and conv.gops > 0


def test_report_formats(report):
    table = report.table(top=5)
    assert "time_ms" in table and "GOPS" in table
    csv = report.csv()
    assert csv.splitlines()[0].startswith("name,op")
    d = json.loads(report.json())
    assert d["total_time_ms"] > 0 and len(d["ops"]) == len(report.entries)


def test_whole_graph_time(report):
    assert report.whole_graph_time_s is not None
    assert report.whole_graph_time_s > 0
