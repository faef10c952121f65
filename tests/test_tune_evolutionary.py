"""Evolutionary tuner search (the meta_schedule/ansor-generation role).

The defining capability over grid/model search: finding optima the seed
grid does not CONTAIN — mutation steps block dims to neighbouring powers
of two, crossover mixes parents, the cost-model surrogate scores
offspring, and only its top picks are measured.
"""

import numpy as np

from tachikoma_tpu.tune.database import NO_ERROR, TuneDatabase, TuneRecord
from tachikoma_tpu.tune.evolutionary import (crossover, evolutionary_search,
                                             mutate)


def _landscape(cfg):
    """Synthetic: optimum at blocks=[1024, 512, 256] — OUTSIDE the seeds."""
    if cfg.get("impl") == "xla":
        return 5.0
    bm, bn, bk = cfg["blocks"]
    return (0.1
            + 0.2 * abs(np.log2(bm) - 10)
            + 0.3 * abs(np.log2(bn) - 9)
            + 0.2 * abs(np.log2(bk) - 8))


def test_mutation_steps_are_pow2_neighbours():
    rng = np.random.default_rng(0)
    base = {"blocks": [512, 128, 128]}
    seen = set()
    for _ in range(200):
        m = mutate(base, rng, layouts=True)
        if "blocks" in m:
            for v in m["blocks"]:
                assert v in (64, 128, 256, 512, 1024, 2048, 4096, 8192)
            seen.add(tuple(m["blocks"]))
    assert len(seen) > 3  # several distinct neighbours reachable


def test_crossover_mixes_parents():
    rng = np.random.default_rng(0)
    a = {"blocks": [512, 128, 128]}
    b = {"blocks": [1024, 256, 256], "layout": "t"}
    kids = [tuple(crossover(a, b, rng)["blocks"]) for _ in range(50)]
    assert any(k != (512, 128, 128) and k != (1024, 256, 256) for k in kids)


def test_evolution_escapes_the_seed_grid(tmp_path):
    db = TuneDatabase(str(tmp_path / "db.jsonl"))
    # warm records on sibling workloads so the surrogate can fit
    rng = np.random.default_rng(1)
    for M in (256, 512):
        for bm in (128, 256, 512):
            for bn in (128, 256):
                cfg = {"blocks": [bm, bn, 128]}
                db.add(TuneRecord(f"qmatmul_int8/M{M}_K512_N512/raw", cfg,
                                  _landscape(cfg) + rng.normal(0, 1e-3)))
    seeds = [{"blocks": [256, 128, 128]}, {"blocks": [512, 128, 128]},
             {"impl": "xla"}]
    seed_best = min(_landscape(c) for c in seeds)

    measured = []

    def measure(cfg):
        measured.append(cfg)
        return _landscape(cfg), NO_ERROR, ""

    best, n = evolutionary_search(
        "qmatmul_int8/M1024_K512_N512/raw", seeds, measure, db,
        generations=4, population=16, measure_per_gen=4, seed=0)
    assert best is not None
    assert best.time_ms / 1e3 < seed_best, (
        f"evolution failed to beat the best seed: {best.config}")
    # bounded measurement budget: seeds + generations * top-k
    assert n <= 2 + 4 * 4 + 1
    # determinism: same seed -> same trajectory
    measured2 = []

    def measure2(cfg):
        measured2.append(cfg)
        return _landscape(cfg), NO_ERROR, ""

    db2 = TuneDatabase(str(tmp_path / "db2.jsonl"))
    for r in db.records[:12]:
        db2.add(r)
    evolutionary_search("qmatmul_int8/M1024_K512_N512/raw", seeds,
                        measure2, db2, generations=4, population=16,
                        measure_per_gen=4, seed=0)
    assert [str(c) for c in measured2[:6]] == [str(c) for c in measured[:6]]


def test_valid_fn_gates_offspring(tmp_path):
    db = TuneDatabase(str(tmp_path / "db.jsonl"))
    seeds = [{"blocks": [512, 128, 128]}]

    def measure(cfg):
        assert cfg["blocks"][1] <= 128, "invalid offspring measured"
        return _landscape(cfg), NO_ERROR, ""

    evolutionary_search(
        "qconv2d_flat/N8_H56_W56_C128_O128_K3x3_S1x1_rq", seeds, measure, db,
        valid_fn=lambda c: "blocks" not in c or c["blocks"][1] <= 128,
        generations=3, population=8, measure_per_gen=3, seed=0)
