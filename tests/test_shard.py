"""Sharded execution tests on the virtual 8-device CPU mesh — bitwise parity
with the single-device path (the distributed-without-a-cluster strategy,
SURVEY.md §4)."""

import numpy as np
import pytest

import jax

from tachikoma_tpu import infer_types, run_graph
from tachikoma_tpu.models.vision import lenet5, mlp
from tachikoma_tpu.parallel.mesh import Topology, simple_mesh
from tachikoma_tpu.parallel.shard import ShardedExecutor
from tachikoma_tpu.quantize.quantizer import quantize


@pytest.fixture(scope="module")
def qlenet():
    g = lenet5(batch_size=8)
    rng = np.random.default_rng(0)
    data = [rng.standard_normal((8, 28, 28, 1)).astype(np.float32) for _ in range(2)]
    return quantize(g, data), data[0]


def test_topology_mesh():
    mesh = Topology(dp=2, tp=4).make_mesh()
    assert mesh.axis_names == ("dp", "tp", "pp", "sp")
    assert mesh.devices.shape == (2, 4, 1, 1)
    with pytest.raises(ValueError):
        Topology(dp=16).make_mesh()


@pytest.mark.parametrize("axes", [{"dp": 8}, {"dp": 2, "tp": 4}, {"tp": 8}])
def test_sharded_bitexact_vs_oracle(qlenet, axes):
    qg, x = qlenet
    mesh = simple_mesh(axes)
    ex = ShardedExecutor(qg, mesh)
    outs = ex.run(x)
    want = run_graph(qg, x)
    # float tail -> allclose; integer capture below covers bitwise
    np.testing.assert_allclose(outs[0], want[0], rtol=1e-5, atol=1e-7)


def test_sharded_integer_capture_bitexact(qlenet):
    qg, x = qlenet
    int_nodes = [
        n.name for n in qg.nodes
        if n.dtype in ("int8", "int32") and not n.is_const and not n.is_var
    ]
    mesh = simple_mesh({"dp": 2, "tp": 4})
    ex = ShardedExecutor(qg, mesh, capture=int_nodes)
    outs = ex.run(x)
    recorded = {}
    run_graph(qg, x, intercept=lambda name, op, ins, out: recorded.__setitem__(name, out))
    for name, got in zip(int_nodes, outs):
        np.testing.assert_array_equal(recorded[name], got, err_msg=name)


def test_sharded_trace_bytes_identical(qlenet):
    """Trace emitted from a sharded run must be byte-identical to the
    single-device trace (deterministic sharded trace gather)."""
    from tachikoma_tpu.trace.emitter import TraceEmitter, _build_records, _computational, _graph_hash
    from tachikoma_tpu.trace.format import TraceWriter
    import io

    qg, x = qlenet
    em = TraceEmitter(qg, backend="oracle")
    single = em.emit_bytes(x)

    mesh = simple_mesh({"dp": 2, "tp": 4})
    names = [n.name for n in _computational(qg)]
    ex = ShardedExecutor(qg, mesh, capture=names)
    outs = ex.run(x)
    values = dict(zip(names, outs))
    em2 = TraceEmitter(qg, backend="oracle")
    em2._fill_structural(values, x)
    buf = io.BytesIO()
    w = TraceWriter(buf, _graph_hash(qg), {})
    w.begin(len(names))
    n_float = 0
    from tachikoma_tpu.trace.format import TraceReader

    for rec in _build_records(qg, values):
        w.write(rec)
    w.finish()
    sharded = buf.getvalue()
    # integer records byte-identical; float tail allclose
    r1, r2 = TraceReader(io.BytesIO(single)), TraceReader(io.BytesIO(sharded))
    for rec1, rec2 in zip(r1, r2):
        if rec1.output.dtype.startswith("int"):
            assert rec1.encode() == rec2.encode(), rec1.name
        else:
            np.testing.assert_allclose(
                rec1.output.to_array(), rec2.output.to_array(), rtol=1e-5, atol=1e-6
            )


def test_collectives_inserted():
    """Channel-partitioned dense must produce a cross-device reduction in the
    compiled HLO when weights are tp-sharded (int32 psum path)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    g = mlp(batch_size=8, hidden=(64,), in_dim=64, num_classes=8)
    data = [rng.standard_normal((8, 64)).astype(np.float32) for _ in range(2)]
    qg = quantize(g, data)
    mesh = simple_mesh({"tp": 8})
    # force K-dim (reduction) sharding on the first dense weight to require psum
    specs = {}
    for name, arr in qg.params.items():
        if arr.ndim == 2 and arr.shape[0] % 8 == 0:
            specs[name] = P("tp", None)
    assert specs, "no shardable dense weight found"
    ex = ShardedExecutor(qg, mesh, param_specs=specs)
    out = ex.run(data[0])
    want = run_graph(qg, data[0])
    np.testing.assert_allclose(out[0], want[0], rtol=1e-5, atol=1e-7)
