"""CLI smoke tests (subprocess, like tvmc's driver tests)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, check=True):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "tachikoma_tpu.cli", *args],
        capture_output=True, text=True, env=env, timeout=600,
    )
    if check:
        assert r.returncode == 0, r.stderr[-2000:]
    return r


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    graph = str(tmp_path / "lenet_q.json")
    trace = str(tmp_path / "lenet.tktrace")

    r = run_cli("quantize", "lenet5", "-o", graph, "--batch", "2")
    assert "nodes" in r.stdout

    r = run_cli("info", graph)
    assert "qnn.conv2d" in r.stdout

    r = run_cli("run", graph, "--backend", "oracle")
    assert "prob" in r.stdout

    r = run_cli("trace", graph, "-o", trace, "--backend", "oracle", "--native")
    assert "records" in r.stdout

    r = run_cli("verify", trace, "--graph", graph)
    assert "verified 25/25" in r.stdout


@pytest.mark.slow
def test_cli_verify_rejects_wrong_graph(tmp_path):
    g1 = str(tmp_path / "a.json")
    g2 = str(tmp_path / "b.json")
    trace = str(tmp_path / "a.tktrace")
    run_cli("quantize", "lenet5", "-o", g1, "--batch", "1")
    run_cli("quantize", "mlp", "-o", g2, "--batch", "1")
    run_cli("trace", g1, "-o", trace, "--backend", "oracle")
    r = run_cli("verify", trace, "--graph", g2, check=False)
    assert r.returncode != 0


def test_cli_unknown_model():
    r = run_cli("quantize", "nonexistent_model", "-o", "/dev/null", check=False)
    assert r.returncode != 0
    assert "unknown zoo model" in (r.stderr + r.stdout)


def test_cli_tune_smoke(tmp_path, rng):
    """cli tune enumerates a graph's workloads and writes DB records
    (interpret-mode measurement on CPU)."""
    import numpy as np

    from tachikoma_tpu.cli import main
    from tachikoma_tpu.ir.graph import GraphBuilder
    from tachikoma_tpu.quantize.quantizer import quantize

    b = GraphBuilder("m")
    x = b.var("x", (2, 16), "float32")
    w = b.const(rng.standard_normal((16, 8)).astype(np.float32))
    g = b.build([b.call("nn.dense", x, w)])
    qg = quantize(g, [rng.standard_normal((2, 16)).astype(np.float32)])
    gpath = tmp_path / "g.json"
    gpath.write_text(qg.to_json())
    dbpath = tmp_path / "db.jsonl"
    main(["tune", str(gpath), "--db", str(dbpath)])
    assert dbpath.exists() and dbpath.read_text().strip()


def test_cli_keras_autodetect(tmp_path):
    """CLI frontend autodetection (tvmc frontends.py role): a .keras file
    runs through quantize and run subcommands."""
    tf = pytest.importorskip("tensorflow")
    L = tf.keras.layers
    m = tf.keras.Sequential([
        L.Input((8, 8, 3)), L.Conv2D(4, 3, padding="same", activation="relu"),
        L.GlobalAveragePooling2D(), L.Dense(3, activation="softmax")])
    path = str(tmp_path / "tiny.keras")
    m.save(path)
    r = run_cli("run", path, "--backend", "oracle")
    assert r.returncode == 0
    qpath = str(tmp_path / "tiny_q.json")
    r = run_cli("quantize", path, "-o", qpath)
    assert "nodes" in r.stdout
