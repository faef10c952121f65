"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): int8 conv GOPS/chip vs the MXU roofline, measured
on a ResNet-50-shaped qnn.conv2d workload; extras record full-graph int8
trace-generation throughput (traces/sec) for quantized ResNet-50.

Timing protocol mirrors the reference's time_evaluator adaptive loop
(`python/tvm/runtime/module.py:273`): warm up, then repeat until
min_repeat_ms, report best-of-repeats.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# TPU v5e (TPU v5 lite) peak int8 throughput per chip, TOPS.
# Public spec: 394.7 TOPS int8 (v5e datasheet).
V5E_INT8_TOPS = 394.7
V5E_BF16_TFLOPS = 197.0


def _timeit(fn, min_repeat_ms=300.0, warmup=3):
    for _ in range(warmup):
        fn()
    times = []
    total = 0.0
    while total * 1000 < min_repeat_ms or len(times) < 5:
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        times.append(dt)
        total += dt
        if len(times) > 200:
            break
    return min(times)


def bench_int8_conv(device):
    """ResNet-50 stage-2 shaped int8 conv (N=8, 56x56x64 -> 3x3x64x64)."""
    import jax
    import jax.numpy as jnp

    from tachikoma_tpu.ops import jax_ops  # noqa: F401
    from tachikoma_tpu.ir.graph import Node
    from tachikoma_tpu.ir.registry import get_op

    n, h, w, cin, cout, k = 8, 56, 56, 128, 128, 3
    rng = np.random.default_rng(0)
    data = jax.device_put(
        rng.integers(-127, 127, (n, h, w, cin)).astype(np.int8), device
    )
    weight = jax.device_put(
        rng.integers(-127, 127, (k, k, cin, cout)).astype(np.int8), device
    )
    node = Node(
        "bench", "qnn.conv2d", ("d", "w"),
        {"strides": (1, 1), "padding": (1, 1, 1, 1), "input_zero_point": 0,
         "kernel_zero_point": 0, "out_dtype": "int32"},
    )
    impl = get_op("qnn.conv2d").jax_impl
    f = jax.jit(lambda d, wt: impl(d, wt, node=node))
    f(data, weight).block_until_ready()  # compile

    def run():
        f(data, weight).block_until_ready()

    t = _timeit(run)
    macs = n * h * w * cout * k * k * cin
    gops = 2 * macs / t / 1e9
    return gops, t


def bench_trace_gen(device):
    """Quantized ResNet-50 full-graph trace generation (execute with per-op
    capture + binary serialization), traces/sec."""
    import io

    from tachikoma_tpu.models.vision import resnet
    from tachikoma_tpu.quantize.quantizer import quantize
    from tachikoma_tpu.trace.emitter import TraceEmitter

    g = resnet(50, batch_size=1, image_size=224)
    rng = np.random.default_rng(0)
    data = [rng.standard_normal((1, 224, 224, 3)).astype(np.float32)]
    qg = quantize(g, data)
    em = TraceEmitter(qg, backend="jax")
    blob = em.emit_bytes(data[0])  # warm (compiles)
    n_records = len(
        [n for n in qg.nodes if n.op not in ("var", "const", "tuple", "tuple_get_item")]
    )

    t = _timeit(lambda: em.emit_bytes(data[0]), min_repeat_ms=2000.0, warmup=1)
    return n_records / t, n_records, len(blob), t


def main():
    import jax

    device = jax.devices()[0]
    platform = device.platform

    gops, conv_t = bench_int8_conv(device)
    roofline_gops = V5E_INT8_TOPS * 1000.0
    frac = gops / roofline_gops if platform == "tpu" else float("nan")

    traces_per_sec, n_records, trace_bytes, trace_t = bench_trace_gen(device)

    result = {
        "metric": "int8_conv_gops",
        "value": round(gops, 2),
        "unit": "GOPS",
        "vs_baseline": round(frac, 4) if frac == frac else 0.0,
        "extra": {
            "device": str(device),
            "platform": platform,
            "conv_time_ms": round(conv_t * 1000, 3),
            "mxu_roofline_frac": round(frac, 4) if frac == frac else None,
            "resnet50_traces_per_sec": round(traces_per_sec, 2),
            "resnet50_trace_records": n_records,
            "resnet50_trace_bytes": trace_bytes,
            "resnet50_trace_time_s": round(trace_t, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
