"""bench.py supervisor hardening (round-2 verdict item 1): a deliberately
wedged first payload attempt must still end in ONE valid JSON line, and the
state file must resume completed sub-benches instead of rerunning them."""

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _run(tmp_path, extra_env):
    env = dict(os.environ)
    env.update({
        "TK_BENCH_STATE": str(tmp_path / "state.json"),
        "TK_BENCH_FAKE": "1",
        "TK_BENCH_PLATFORM": "cpu",  # also skips the TPU probe loop
        "TK_BENCH_COOLDOWN": "0",
    })
    env.update(extra_env)
    r = subprocess.run([sys.executable, BENCH], capture_output=True,
                       text=True, timeout=120, env=env)
    return r


def test_crashed_first_attempt_still_emits_json(tmp_path):
    r = _run(tmp_path, {"TK_BENCH_CRASH_ONCE": "1"})
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    out = json.loads(lines[0])
    # round-5 headline anchor: the stage-resident chain conv (BASELINE.md)
    assert out["metric"] == "int8_conv_chain_gops"
    assert out["value"] > 0
    assert set(out["extra"]["completed"]) == {
        "conv", "conv_kernel", "matmul", "chain", "stack", "resnet50",
        "resnet50_b32", "trace"}
    assert "simulated crash" in r.stderr
    assert "payload attempt 2" in r.stderr


def test_partial_state_resumes(tmp_path):
    state = tmp_path / "state.json"
    state.write_text(json.dumps(
        {"conv": {"gops": 42.0, "time_s": 1.0}, "platform": "tpu",
         "device": "pre"}))
    r = _run(tmp_path, {"TK_BENCH_RESUME": "1"})
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip())
    # the pre-existing conv result was kept, not re-measured (the headline
    # is the chain; the wrapper is the int8_conv_gops sub-metric)
    assert out["extra"]["int8_conv_gops"] == 42.0
    assert "conv already done, skipping" in r.stderr


def test_vs_baseline_fraction(tmp_path):
    r = _run(tmp_path, {})
    out = json.loads(r.stdout.strip())
    # fake chain gops 105 ("chain" -> 100 + 5) vs 394.7 TOPS roofline
    assert out["vs_baseline"] == round(105.0 / 394700.0, 4)
    assert out["extra"]["errors"] == {}
