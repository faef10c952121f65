"""Graph-level tuner: whole-graph chain-decision search with an injected
(e2e) measurer — the autotvm graph_tuner role rebuilt on measured
end-to-end latency (per-workload records mispredict in-context cost)."""

import numpy as np
import pytest

from tachikoma_tpu import GraphBuilder, infer_types, run_graph
from tachikoma_tpu.quantize.quantizer import quantize
from tachikoma_tpu.runtime.fuse import fuse_qnn
from tachikoma_tpu.tune.database import TuneDatabase
from tachikoma_tpu.tune.graph_tuner import (apply_variant, chain_runs,
                                            tune_graph)


def _two_chain_model(rng):
    b = GraphBuilder()
    x = b.var("x", (1, 12, 12, 8), "float32")

    def conv(src, cin, cout, name):
        w = b.const(rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
                    * 0.2, name + "_w")
        c = b.call("nn.conv2d", src, w, padding=(1, 1, 1, 1), name=name)
        return b.call("nn.relu", c)

    h = conv(conv(x, 8, 8, "c1"), 8, 8, "c2")           # run 1
    h = b.call("nn.max_pool2d", h, pool_size=(2, 2), strides=(2, 2))
    h = conv(conv(conv(h, 8, 16, "c3"), 16, 16, "c4"), 16, 8, "c5")  # run 2
    return infer_types(b.build(h))


def test_apply_variant_bit_exact(rng):
    g = _two_chain_model(rng)
    calib = [rng.standard_normal((1, 12, 12, 8)).astype(np.float32)]
    qg = quantize(g, calib)
    fused = fuse_qnn(qg)
    runs = chain_runs(fused)
    assert len(runs) == 2
    # disabling one chain splits it back to sequential convs, values equal
    v = apply_variant(qg, fused, {runs[0]})
    ops = [n.op for n in v.nodes]
    assert ops.count("tk.conv2d_chain") == 1
    assert "tk.conv2d_rq" in ops
    a = run_graph(fused, calib[0])
    c = run_graph(v, calib[0])
    for x, y in zip(a, c):
        assert (np.asarray(x) == np.asarray(y)).all()
    # disabling both removes every chain
    v2 = apply_variant(qg, fused, set(runs))
    assert all(n.op != "tk.conv2d_chain" for n in v2.nodes)
    for x, y in zip(a, run_graph(v2, calib[0])):
        assert (np.asarray(x) == np.asarray(y)).all()


def test_tune_graph_greedy_finds_better_variant(rng, tmp_path):
    g = _two_chain_model(rng)
    calib = [rng.standard_normal((1, 12, 12, 8)).astype(np.float32)]
    qg = quantize(g, calib)
    fused = fuse_qnn(qg)
    runs = chain_runs(fused)
    slow = runs[0]  # pretend chain 0 is a regression

    def measure(graph):
        ops = [n.name for n in graph.nodes if n.op == "tk.conv2d_chain"]
        t = 1.0
        if slow in ops:
            t += 0.5     # chained form of run 0 is slower
        if runs[1] not in ops:
            t += 0.3     # chain 1 is genuinely profitable
        return t

    db = TuneDatabase(str(tmp_path / "db.jsonl"))
    res = tune_graph(qg, measure, db=db, verbose=False)
    assert res.best_disabled == [slow]
    assert res.baseline_time_s == pytest.approx(1.5)
    assert res.best_time_s == pytest.approx(1.0)
    assert res.trials == 3
    recs = [r for r in db.records if r.workload.startswith("graph/")]
    assert len(recs) == 3
