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


def test_ablate_graph_cumulative(rng):
    """Cut-point ablation: cumulative times are monotone, deltas sum to the
    full-graph time, auto-cuts land on articulation points."""
    from tachikoma_tpu import GraphBuilder, infer_types
    from tachikoma_tpu.runtime.profiler import ablate_graph

    b = GraphBuilder()
    x = b.var("x", (2, 16, 16, 8), "float32")
    h = x
    for i in range(4):
        w = b.const(rng.standard_normal((3, 3, 8, 8)).astype(np.float32)
                    * 0.2, f"w{i}")
        h = b.call("nn.conv2d", h, w, padding=(1, 1, 1, 1), name=f"c{i}")
        h = b.call("nn.relu", h, name=f"r{i}")
    g = infer_types(b.build(h))
    xin = rng.standard_normal((2, 16, 16, 8)).astype(np.float32)
    rep = ablate_graph(g, xin, min_ops=2, max_ops=4, repeats=1)
    assert len(rep.entries) >= 2
    assert rep.entries[-1].label == g.outputs[0]
    cum = [e.cumulative_s for e in rep.entries]
    assert all(c > 0 for c in cum)
    assert abs(sum(e.delta_s for e in rep.entries) - cum[-1]) < 1e-9
    assert sum(e.n_ops for e in rep.entries) == 8
    # all three formats render
    assert "cum ms" in rep.table()
    assert "cumulative_ms" in rep.csv()
    import json as _json

    _json.loads(rep.json())


def test_ablate_cli(tmp_path, rng):
    from tachikoma_tpu import GraphBuilder, infer_types
    from tachikoma_tpu.cli import main as cli_main

    b = GraphBuilder()
    x = b.var("x", (1, 8, 8, 4), "float32")
    w = b.const(rng.standard_normal((3, 3, 4, 4)).astype(np.float32), "w")
    h = b.call("nn.conv2d", x, w, padding=(1, 1, 1, 1))
    h = b.call("nn.relu", h)
    g = infer_types(b.build(h))
    p = tmp_path / "g.json"
    p.write_text(g.to_json())
    import sys as _sys

    argv = _sys.argv
    try:
        _sys.argv = ["tk", "profile", str(p), "--mode=ablate",
                     "--format=json", "--repeats", "1"]
        cli_main()
    finally:
        _sys.argv = argv
