"""Multi-HOST trace gather — two real processes with jax.distributed,
each owning half the virtual devices (the reference simulates multi-node
with in-process RPC servers, SURVEY.md §4; here the jax process group is
real and the trace must come out byte-identical to single-host)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
import numpy as np
from tachikoma_tpu.models.vision import lenet5
from tachikoma_tpu.quantize.quantizer import quantize
from tachikoma_tpu.parallel.mesh import simple_mesh
from tachikoma_tpu.parallel.gather import ShardedTraceEmitter, is_coordinator

g = lenet5(batch_size=8)
rng = np.random.default_rng(0)
data = [rng.standard_normal((8, 28, 28, 1)).astype(np.float32) for _ in range(2)]
qg = quantize(g, data)
mesh = simple_mesh({"dp": 2, "tp": 4})   # dp crosses the process boundary
em = ShardedTraceEmitter(qg, mesh)
if is_coordinator():
    with open(sys.argv[4], "wb") as f:
        manifest = em.emit(data[0], f)
    print("COORD records", manifest["records"], flush=True)
else:
    manifest = em.emit(data[0], None)
    print("WORKER records", manifest["records"], flush=True)
"""


@pytest.mark.slow
def test_two_process_trace_gather(tmp_path):
    port = _free_port()
    out = str(tmp_path / "multi.tktrace")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), "2", str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        outputs.append(stdout.decode())
        assert p.returncode == 0, stdout.decode()[-2000:]
    assert any("COORD records" in o for o in outputs)

    # compare against single-host emission
    from tachikoma_tpu.models.vision import lenet5
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.trace.emitter import TraceEmitter
    from tachikoma_tpu.trace.format import TraceReader
    import io

    g = lenet5(batch_size=8)
    rng = np.random.default_rng(0)
    data = [rng.standard_normal((8, 28, 28, 1)).astype(np.float32) for _ in range(2)]
    qg = quantize(g, data)
    single = TraceEmitter(qg, backend="oracle").emit_bytes(data[0])
    multi = open(out, "rb").read()
    r1, r2 = TraceReader(io.BytesIO(single)), TraceReader(io.BytesIO(multi))
    assert len(r1) == len(r2)
    for rec1, rec2 in zip(r1, r2):
        if rec1.output.dtype.startswith(("int", "uint")):
            assert rec1.encode() == rec2.encode(), rec1.name
        else:
            np.testing.assert_allclose(
                rec1.output.to_array(), rec2.output.to_array(), rtol=1e-5, atol=1e-6
            )


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_scaling_efficiency_harness():
    """scripts/scaling_efficiency.py end-to-end over real jax.distributed
    process groups (the BASELINE efficiency harness; CPU-mesh numbers are
    correctness-shaped — the assertions are structural)."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "scaling_efficiency.py"),
         "--procs", "1,2", "--steps", "4", "--batch", "8"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "PYTHONPATH": repo})
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["metric"] == "scaling_efficiency"
    assert out["procs"] == [1, 2]
    for key in ("weak_step_ms", "strong_step_ms", "weak_efficiency",
                "strong_efficiency", "traces_per_sec"):
        assert set(map(int, out[key])) == {1, 2}, key
    assert all(v > 0 for v in out["weak_step_ms"].values())
    assert out["trace_records"] > 0
