"""BASELINE config 5: ViT-L int8 sharded trace, end-to-end.

Quantizes ViT-L/16 (batch 1, 224x224), emits the full int8 trace from an
8-device dp x tp GSPMD mesh, byte-compares against the single-device trace,
and reports traces/sec + bytes.  Runs on the virtual CPU mesh (the
environment has one physical TPU chip); the sharding program is the same
one the dryrun compiles for real meshes.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/vitl_trace.py [--small]
"""
import os
import sys
import time

# the harness env pins JAX_PLATFORMS=axon (TPU tunnel); this workload is a
# CPU-mesh sharding validation — force-override like tests/conftest.py
os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def main():
    import jax

    from tachikoma_tpu.models.transformer import vit, vit_l16
    from tachikoma_tpu.parallel.gather import ShardedTraceEmitter
    from tachikoma_tpu.quantize.config import TRANSFORMER_INT8
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.trace.emitter import TraceEmitter
    from tachikoma_tpu.trace.format import TraceReader

    small = "--small" in sys.argv
    t0 = time.time()
    if small:
        g = vit(batch_size=1, image_size=64, patch=16, hidden=256, layers=4,
                heads=4, ffn_dim=512, num_classes=10)
        x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    else:
        g = vit_l16(batch_size=1, image_size=224)
        x = np.random.default_rng(0).standard_normal((1, 224, 224, 3)).astype(np.float32)
    print(f"built ViT ({len(g.nodes)} nodes) {time.time()-t0:.1f}s", flush=True)

    qg = quantize(g, [x], config=TRANSFORMER_INT8)
    print(f"quantized ({len(qg.nodes)} nodes) {time.time()-t0:.1f}s", flush=True)

    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "tp"))

    em = TraceEmitter(qg, backend="jax")
    t1 = time.time()
    single = em.emit_bytes(x)
    t_single = time.time() - t1
    print(f"single-device trace: {len(single)} bytes in {t_single:.1f}s", flush=True)

    sem = ShardedTraceEmitter(qg, mesh)
    t1 = time.time()
    sharded = sem.emit_bytes(x)
    t_shard = time.time() - t1
    print(f"sharded trace:       {len(sharded)} bytes in {t_shard:.1f}s", flush=True)

    identical = single == sharded
    import io
    n_rec = TraceReader(io.BytesIO(sharded)).num_records
    print(f"byte-identical: {identical}")
    print(f"records: {n_rec}  records/sec(sharded): {n_rec / t_shard:.2f}")
    if not identical:
        sys.exit(1)


if __name__ == "__main__":
    main()
