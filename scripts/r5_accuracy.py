"""Round-5 accuracy table: REAL-trained models, held-out labeled data,
full calibration-mode comparison (verdict item 5).

Rows: digits CNN (real data, real labels), synth_resnet + synth_mbv2
(trained in-tree to >=0.99 float top-1 on the labeled synthetic task,
evaluated on the 1000-sample held-out head the trainer never saw).

    PYTHONPATH=/root/repo python scripts/r5_accuracy.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tachikoma_tpu.quantize.accuracy import compare_calibrations, table  # noqa: E402
from tachikoma_tpu.quantize.dataset import Dataset, digits, synthetic_labeled  # noqa: E402
from tachikoma_tpu.runtime.artifact import load_artifact  # noqa: E402

FIX = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def digits_row():
    from tachikoma_tpu.models.vision import digits_cnn

    w = dict(np.load(os.path.join(FIX, "digits_cnn.npz")))
    g = digits_cnn(w, batch_size=32)
    ds = digits()
    head = Dataset(ds.data[:512], ds.labels[:512], "digits[head]")
    return "digits_cnn", compare_calibrations(g, head, calib_samples=64)


def synth_row(name):
    g, man = load_artifact(os.path.join(FIX, f"{name}.tkmod"))
    meta = np.load(os.path.join(FIX, f"{name}_meta.npz"))
    ds = synthetic_labeled(int(meta["holdout"]),
                           tuple(int(v) for v in meta["shape"]),
                           int(meta["num_classes"]), seed=int(meta["seed"]))
    ds = Dataset(np.ascontiguousarray(ds.data.transpose(0, 3, 1, 2)),
                 ds.labels, ds.name)
    return name, compare_calibrations(g, ds, calib_samples=64)


def main():
    out = {}
    for name, reports in (digits_row(), synth_row("synth_resnet"),
                          synth_row("synth_mbv2")):
        print(f"== {name}")
        print(table(reports))
        out[name] = [
            dict(mode=r.name, n=r.n, top1_agree=r.top1_agree,
                 top5_agree=r.top5_agree, top1_float=r.top1_float,
                 top1_quant=r.top1_quant, top5_float=r.top5_float,
                 top5_quant=r.top5_quant)
            for r in reports]
    path = "/tmp/r5/accuracy.json"
    os.makedirs("/tmp/r5", exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
