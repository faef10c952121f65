"""Model zoo coverage: every family builds, runs, and quantizes.

(The reference zoo parity check, `python/tvm/relay/testing/` — SURVEY.md §2.9.)"""

import numpy as np
import pytest

from tachikoma_tpu import run_graph
from tachikoma_tpu.models import vision as V
from tachikoma_tpu.quantize.quantizer import quantize

CASES = [
    ("vgg11", lambda: V.vgg(11, image_size=32), (1, 32, 32, 3), 0.98),
    ("squeezenet", lambda: V.squeezenet(image_size=96), (1, 96, 96, 3), 0.99),
    ("densenet", lambda: V.densenet(image_size=32, blocks=(2, 2)), (1, 32, 32, 3), 0.98),
    ("inception", lambda: V.inception_v3_stem(image_size=96), (1, 96, 96, 3), 0.95),
    ("dcgan", lambda: V.dcgan_generator(), (1, 100), 0.99),
    ("dqn", lambda: V.dqn(), (1, 84, 84, 4), 0.99),
]


@pytest.mark.parametrize("name,build,shape,min_corr", CASES, ids=[c[0] for c in CASES])
def test_zoo_model_quantizes(name, build, shape, min_corr):
    rng = np.random.default_rng(0)
    g = build()
    x = rng.standard_normal(shape).astype(np.float32)
    fout = run_graph(g, x)[0]
    qg = quantize(g, [x])
    qout = run_graph(qg, x)[0]
    assert fout.shape == qout.shape
    corr = np.corrcoef(fout.ravel(), qout.ravel())[0, 1]
    assert corr > min_corr, f"{name}: corr {corr}"
