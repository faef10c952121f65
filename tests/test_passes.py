"""Pass infra tests: context stack, opt levels, disabling, instruments."""

import numpy as np
import pytest

from tachikoma_tpu import run_graph
from tachikoma_tpu.ir.passes import (
    Pass,
    PassContext,
    PassTimingInstrument,
    PrintBeforeAfter,
    Sequential,
    default_pipeline,
    module_pass,
)
from tachikoma_tpu.models.vision import lenet5, resnet


def test_default_pipeline_runs(rng):
    g = resnet(18, batch_size=1, image_size=32)
    timer = PassTimingInstrument()
    with PassContext(opt_level=3, instruments=[timer]):
        g2 = default_pipeline()(g)
    assert not any(n.op == "nn.batch_norm" for n in g2.nodes)
    assert set(timer.times) >= {"fold_constant", "fold_batch_norm"}
    assert "fold_batch_norm" in timer.render()
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(
        run_graph(g, x)[0], run_graph(g2, x)[0], rtol=1e-3, atol=1e-4
    )


def test_opt_level_gates():
    calls = []

    @module_pass(opt_level=3)
    def heavy(graph):
        calls.append("heavy")
        return graph

    g = lenet5(batch_size=1)
    with PassContext(opt_level=2):
        heavy(g)
    assert calls == []
    with PassContext(opt_level=3):
        heavy(g)
    assert calls == ["heavy"]


def test_disabled_pass():
    g = resnet(18, batch_size=1, image_size=32)
    with PassContext(opt_level=3, disabled_pass={"fold_batch_norm"}):
        g2 = default_pipeline()(g)
    assert any(n.op == "nn.batch_norm" for n in g2.nodes)


def test_print_instrument(capsys):
    logs = []
    g = lenet5(batch_size=1)
    with PassContext(instruments=[PrintBeforeAfter({"fold_constant"}, logs.append)]):
        default_pipeline()(g)
    assert len(logs) == 2 and "fold_constant" in logs[0]


def test_context_nesting():
    assert PassContext.current().opt_level == 2
    with PassContext(opt_level=0):
        assert PassContext.current().opt_level == 0
        with PassContext(opt_level=3, config={"k": 1}):
            assert PassContext.current().config["k"] == 1
        assert PassContext.current().opt_level == 0
    assert PassContext.current().opt_level == 2


def test_combine_parallel_dense(rng):
    """CombineParallelDense analog: sibling dense ops merge into one matmul
    + splits; numerics preserved."""
    import numpy as np

    from tachikoma_tpu import run_graph
    from tachikoma_tpu.ir.graph import GraphBuilder
    from tachikoma_tpu.ir.transforms import combine_parallel_dense

    b = GraphBuilder("qkv")
    x = b.var("x", (4, 16), "float32")
    outs = []
    for i in range(3):
        w = b.const(rng.standard_normal((16, 8)).astype(np.float32), name=f"w{i}")
        outs.append(b.call("nn.dense", x, w, name=f"d{i}"))
    g = b.build([b.call("concatenate", *outs, axis=-1)])
    g2 = combine_parallel_dense(g)
    assert sum(1 for n in g2.nodes if n.op == "nn.dense") == 1
    xi = rng.standard_normal((4, 16)).astype(np.float32)
    np.testing.assert_allclose(run_graph(g, [xi])[0], run_graph(g2, [xi])[0],
                               rtol=1e-5, atol=1e-5)
