"""Pipeline executor: stage splitting + microbatched parity with the
single-device path (bitwise for integer graphs)."""

import numpy as np
import pytest

from tachikoma_tpu import run_graph
from tachikoma_tpu.models.vision import lenet5, mlp
from tachikoma_tpu.parallel.pipeline import PipelineExecutor, split_stages
from tachikoma_tpu.quantize.quantizer import quantize


@pytest.fixture(scope="module")
def qlenet():
    g = lenet5(batch_size=8)
    rng = np.random.default_rng(0)
    data = [rng.standard_normal((8, 28, 28, 1)).astype(np.float32) for _ in range(2)]
    return quantize(g, data), data[0]


def test_split_stages_covers_graph(qlenet):
    qg, _ = qlenet
    stages = split_stages(qg, 4)
    assert 2 <= len(stages) <= 4
    comp_names = {n.name for n in qg.nodes if not n.is_const and not n.is_var}
    staged = set()
    for st in stages:
        staged |= {n.name for n in st.graph.nodes if not n.is_const and not n.is_var}
    assert staged == comp_names
    # stage outputs feed later stage inputs
    produced = set()
    for st in stages:
        for i in st.inputs:
            assert i in produced or i in {n.name for n in qg.inputs}
        produced |= set(st.outputs)


@pytest.mark.parametrize("num_stages,micro", [(2, 1), (2, 4), (4, 2)])
def test_pipeline_bitexact(qlenet, num_stages, micro):
    qg, x = qlenet
    want = run_graph(qg, x)
    pe = PipelineExecutor(qg, num_stages)
    got = pe.run(x, num_microbatches=micro)
    assert len(got) == len(want)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-5, atol=1e-7)


def test_pipeline_float_model():
    g = mlp(batch_size=4, hidden=(64, 32))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 784)).astype(np.float32)
    want = run_graph(g, x)[0]
    pe = PipelineExecutor(g, 3)
    got = pe.run({"data": x}, num_microbatches=2)[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_pipeline_too_many_stages(qlenet):
    qg, _ = qlenet
    import jax

    with pytest.raises(ValueError):
        PipelineExecutor(qg, len(jax.devices()) + 50)
