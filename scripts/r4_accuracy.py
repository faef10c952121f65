"""Round-4 accuracy table (VERDICT item 6): MobileNetV2 + ResNet-50
float-vs-int8 top-1/top-5 agreement over 200 structured synthetic images,
per calibration mode (max / percentile / KL), plus the REAL labeled number
on the trained digits CNN.  Executor = jax (runs on the attached device).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_accuracy.py
"""

import os


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tk_jaxcache")
    import numpy as np  # noqa: F401

    from tachikoma_tpu.models import digits_cnn
    from tachikoma_tpu.models.vision import mobilenet_v2, resnet
    from tachikoma_tpu.quantize.accuracy import compare_calibrations, table
    from tachikoma_tpu.quantize.dataset import digits, synthetic_images

    fx = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures", "digits_cnn.npz")

    print("== digits_cnn (REAL labels, trained weights) ==", flush=True)
    g = digits_cnn(fx, batch_size=64)
    head = digits().split(512)[0]   # training held out the first 512
    print(table(compare_calibrations(
        g, head, modes=("max", "percentile", "kl"), calib_samples=64,
        executor="jax", limit=448)), flush=True)

    for name, builder in [("mobilenet_v2", mobilenet_v2),
                          ("resnet50", lambda **kw: resnet(50, **kw))]:
        print(f"== {name} b8 224^2 (agreement, 200 synthetic) ==", flush=True)
        m = builder(batch_size=8, image_size=224)
        ds = synthetic_images(200, (224, 224, 3), seed=1)
        print(table(compare_calibrations(
            m, ds, modes=("max", "percentile", "kl"), calib_samples=16,
            executor="jax", limit=184)), flush=True)


if __name__ == "__main__":
    main()
