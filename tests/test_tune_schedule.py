"""Budget scheduler (tune/schedule.py) — the auto_scheduler TaskScheduler
gradient analog: allocate a fixed measurement budget across a model's
workloads by expected e2e gain."""

import numpy as np

from tachikoma_tpu.tune.database import TuneDatabase
from tachikoma_tpu.tune.schedule import TuneTask, graph_tasks, schedule_tune


def _synthetic_task(name, weight, times):
    """times: per-config 'true' latency (seconds); measure just looks up."""
    configs = [{"blocks": [128 * (i % 4 + 1), 128, 128], "i": i}
               for i in range(len(times))]

    def measure(cfg):
        return times[cfg["i"]], 0, ""

    return TuneTask(workload=f"qmatmul_int8/M512_K512_N{128+weight}/fused",
                    configs=configs, measure=measure,
                    meta_fn=None, weight=weight)


def test_scheduler_respects_budget_and_covers_tasks(tmp_path):
    rng = np.random.default_rng(0)
    tasks = [
        _synthetic_task("a", 8, list(rng.uniform(80e-6, 120e-6, 24))),
        _synthetic_task("b", 1, list(rng.uniform(10e-6, 12e-6, 24))),
        _synthetic_task("c", 2, list(rng.uniform(40e-6, 90e-6, 24))),
    ]
    db = TuneDatabase(str(tmp_path / "db.jsonl"))
    rep = schedule_tune(tasks, db, total_trials=30, min_per_task=2)
    assert rep["total_trials"] == 30
    per = rep["per_task"]
    trials = {w: v["trials"] for w, v in per.items()}
    assert all(t >= 2 for t in trials.values())          # warmup floor
    # the heavy task (weight 8, wide spread) draws the most budget;
    # the tiny flat task (weight 1, 10-12us) draws the least
    ws = list(per)
    assert trials[ws[0]] > trials[ws[1]], trials
    # the db recorded every trial
    assert len(db) == 30
    # projected latency = sum weight * best
    best0 = per[ws[0]]["best_us"]
    assert best0 is not None and best0 <= 120


def test_scheduler_handles_failing_task(tmp_path):
    bad = TuneTask(
        workload="qmatmul_int8/M64_K64_N64/fused",
        configs=[{"i": i} for i in range(4)],
        measure=lambda cfg: (float("inf"), 2, "boom"),
        meta_fn=None, weight=4)
    good = _synthetic_task("g", 1, [50e-6, 40e-6, 45e-6, 60e-6])
    db = TuneDatabase(str(tmp_path / "db.jsonl"))
    rep = schedule_tune([bad, good], db, total_trials=10, min_per_task=1)
    per = rep["per_task"]
    assert per[bad.workload]["best_us"] is None
    assert per[good.workload]["best_us"] is not None
    assert rep["total_trials"] <= 10


def test_graph_tasks_counts_occurrences():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tachikoma_tpu.models.vision import resnet
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.runtime.fuse import fuse_qnn

    g = resnet(18, batch_size=1, image_size=32)
    rng = np.random.default_rng(0)
    qg = quantize(g, [rng.standard_normal((1, 32, 32, 3)).astype(np.float32)])
    fg = fuse_qnn(qg)
    tasks = graph_tasks(fg)
    assert tasks, "expected tunable workloads"
    # chains/stacks are tasks too (fuse absorbs repeated stage convs into
    # them; round 5: identity-residual runs further fuse into stacks)
    assert any(t.workload.startswith(("qconv2d_chain/", "qconv2d_stack/"))
               for t in tasks), [t.workload for t in tasks]
    # every task is runnable-shaped
    for t in tasks:
        assert t.configs and callable(t.measure)

    # repeated shapes carry multiplicity, not dedupe to 1 (round 5: the
    # resnet-18 repeats all fused into stacks, so build the repeat
    # explicitly: two identical lone convs)
    from tachikoma_tpu import GraphBuilder, infer_types

    b = GraphBuilder()
    x = b.var("x", (1, 8, 8, 8), "float32")
    h = x
    for i in range(2):
        w = b.const(rng.standard_normal((3, 3, 8, 8)).astype(np.float32)
                    * 0.2, f"w{i}")
        h = b.call("nn.relu", b.call("nn.conv2d", h, w,
                                     padding=(1, 1, 1, 1), name=f"c{i}"))
        h = b.call("nn.max_pool2d", h, pool_size=(1, 1), strides=(1, 1),
                   padding=(0, 0, 0, 0), name=f"p{i}")  # break chaining
    g2 = infer_types(b.build(h))
    qg2 = quantize(g2, [rng.standard_normal((1, 8, 8, 8)).astype(np.float32)])
    t2 = graph_tasks(fuse_qnn(qg2))
    assert any(t.weight >= 2 for t in t2), \
        [(t.workload, t.weight) for t in t2]
