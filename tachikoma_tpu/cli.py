"""tk — command-line driver (the tvmc equivalent).

Mirrors the reference's `tvmc compile/run/tune` surface
(`python/tvm/driver/tvmc/{main.py:114,compiler.py:52,runner.py:71}`) with the
subcommands this framework's workflow needs:

  quantize  — import a model (zoo or torch file), calibrate, emit integer
              graph JSON artifact
  run       — execute a graph artifact (oracle or XLA), print outputs
  trace     — emit a tachikoma-standard trace binary for given inputs
  verify    — CRC + semantic verification of a trace binary
  profile   — per-op timing report
  bench     — one-line JSON benchmark (same schema as bench.py)
  info      — show a graph artifact (ops, shapes, hash)

Usage: python -m tachikoma_tpu.cli <subcommand> [args]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


MODEL_SUFFIXES = (".json", ".onnx", ".tflite", ".keras", ".h5", ".pb",
                  ".pt", ".pth")


def _load_graph(path: str):
    """Frontend autodetection by suffix (the tvmc `frontends.py` role:
    `/root/reference/python/tvm/driver/tvmc/frontends.py` guess_frontend)."""
    import os

    if path.endswith(".onnx"):
        from .frontend.onnx import from_onnx

        return from_onnx(path)
    if path.endswith(".tflite"):
        # prequantized: already an integer graph, runnable/traceable as-is
        from .frontend.tflite import from_tflite

        return from_tflite(path)
    if path.endswith((".keras", ".h5")):
        from .frontend.keras import from_keras

        return from_keras(path)
    if path.endswith((".pt", ".pth")):
        # torch.save'd nn.Module / fx GraphModule.  Quantized (torch.ao
        # converted) models import via the prequantized path; float models
        # via the fx frontend.  Input shape: a (model, shape) tuple in the
        # file, or TK_TORCH_INPUT_SHAPE="1,3,224,224".
        import torch

        obj = torch.load(path, weights_only=False, map_location="cpu")
        shape = None
        if isinstance(obj, (tuple, list)) and len(obj) == 2:
            obj, shape = obj
        if shape is None:
            env = os.environ.get("TK_TORCH_INPUT_SHAPE")
            if not env:
                raise SystemExit(
                    "torch import needs an input shape: save a (model, "
                    "shape) tuple or set TK_TORCH_INPUT_SHAPE=1,3,224,224")
            shape = tuple(int(v) for v in env.split(","))
        # quantized-module detection; torch's pickle round-trip of intrinsic
        # quantized modules is broken in some versions (module iteration
        # raises), so fall back to scanning the fx graph's call targets —
        # in-memory converted models import via the API either way
        try:
            quantized = any(
                type(m).__module__.startswith(
                    ("torch.ao.nn.quantized",
                     "torch.ao.nn.intrinsic.quantized"))
                for m in dict(obj.named_modules()).values())
        except Exception:
            quantized = hasattr(obj, "graph") and any(
                "quantiz" in str(getattr(n, "target", ""))
                for n in obj.graph.nodes)
        if quantized:
            from .frontend.torch_quantized import import_torch_quantized

            return import_torch_quantized(obj, {"x": tuple(shape)})
        from .frontend.torch_fx import from_torch

        return from_torch(obj, {"x": tuple(shape)})
    if path.endswith(".pb") or os.path.isdir(path):
        # frozen GraphDef / SavedModel directory
        if os.path.isdir(path):
            from .frontend.tensorflow import from_saved_model

            return from_saved_model(path)
        import tensorflow as tf

        from .frontend.tensorflow import from_tf_graphdef

        gd = tf.compat.v1.GraphDef()
        with open(path, "rb") as f:
            gd.ParseFromString(f.read())
        return from_tf_graphdef(gd)
    from .ir.graph import Graph

    with open(path) as f:
        return Graph.from_json(f.read())


def _is_model_file(name: str) -> bool:
    import os

    return name.endswith(MODEL_SUFFIXES) or os.path.isdir(name)


def _zoo(name: str, batch: int, image: int | None, seq: int | None):
    from .models import transformer, vision

    name = name.lower()
    if name == "lenet5":
        return vision.lenet5(batch_size=batch)
    if name == "mlp":
        return vision.mlp(batch_size=batch)
    if name in ("resnet18", "resnet34", "resnet50"):
        return vision.resnet(int(name[6:]), batch_size=batch, image_size=image or 224)
    if name == "mobilenet_v2":
        return vision.mobilenet_v2(batch_size=batch, image_size=image or 224)
    if name in ("bert", "bert_base"):
        return transformer.bert_base(batch_size=batch, seq_len=seq or 128)
    if name == "vit_b16":
        return transformer.vit_b16(batch_size=batch, image_size=image or 224)
    if name == "vit_l16":
        return transformer.vit_l16(batch_size=batch, image_size=image or 224)
    if name == "gpt2":
        return transformer.gpt2_small(batch_size=batch, seq_len=seq or 128)
    if name in ("vgg16", "vgg19"):
        return vision.vgg(int(name[3:]), batch_size=batch,
                          image_size=image or 224)
    if name == "squeezenet":
        return vision.squeezenet(batch_size=batch, image_size=image or 224)
    if name == "densenet":
        return vision.densenet(batch_size=batch, image_size=image or 224)
    if name == "resnet3d18":
        return vision.resnet_3d(18, batch_size=batch,
                                image_size=image or 112)
    if name == "lstm":
        return vision.lstm(batch_size=batch, seq_len=seq or 16)
    if name == "digits_cnn":
        import os

        fx = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests", "fixtures",
            "digits_cnn.npz")
        return vision.digits_cnn(fx, batch_size=batch)
    raise SystemExit(f"unknown zoo model {name!r} (see tachikoma_tpu.models)")


def _rand_inputs(graph, seed=0):
    rng = np.random.default_rng(seed)
    out = {}
    for n in graph.inputs:
        if n.dtype.startswith("int"):
            out[n.name] = rng.integers(0, 100, n.shape).astype(n.dtype)
        else:
            out[n.name] = rng.standard_normal(n.shape).astype(n.dtype)
    return out


def _load_inputs(args, graph):
    if getattr(args, "input", None):
        data = np.load(args.input)
        if hasattr(data, "files"):
            return {k: data[k] for k in data.files}
        return {graph.inputs[0].name: data}
    return _rand_inputs(graph)


def cmd_quantize(args):
    from .quantize.config import TRANSFORMER_INT8, QConfig
    from .quantize.quantizer import quantize

    if _is_model_file(args.model):
        g = _load_graph(args.model)
    else:
        g = _zoo(args.model, args.batch, args.image_size, args.seq_len)
    rng = np.random.default_rng(0)
    if args.calib_data:
        data = np.load(args.calib_data)
        batches = [{k: data[k] for k in data.files}] if hasattr(data, "files") else [data]
    else:
        batches = [_rand_inputs(g, seed=i) for i in range(args.calib_batches)]
    cfg = TRANSFORMER_INT8 if args.transformer else QConfig(calibrate_mode=args.calibrate_mode)
    qg = quantize(g, batches, cfg)
    with open(args.output, "w") as f:
        f.write(qg.to_json())
    print(f"wrote {args.output}: {len(qg)} nodes, hash {qg.structural_hash()[:16]}")


def cmd_run(args):
    g = _load_graph(args.graph)
    inputs = _load_inputs(args, g)
    if args.backend == "oracle":
        from .runtime.interpreter import run_graph

        outs = run_graph(g, inputs)
    elif args.segmented:
        # graph-as-data execution for deep models (per-segment programs,
        # structural sharing, scan-over-layers — runtime/segmented.py)
        from .runtime.segmented import SegmentedExecutor

        outs = SegmentedExecutor(g, fuse=not args.no_fuse).run(inputs)
    else:
        from .runtime.executor import JaxExecutor

        outs = JaxExecutor(g, fuse=not args.no_fuse).run(inputs)
    for name, o in zip(g.outputs, outs):
        print(f"{name}: {o.dtype}{list(o.shape)}")
        with np.printoptions(threshold=20, precision=4):
            print(o)
    if args.output:
        np.savez(args.output, **dict(zip(g.outputs, outs)))


def cmd_trace(args):
    g = _load_graph(args.graph)
    inputs = _load_inputs(args, g)
    meta = {"model": args.graph}
    if getattr(args, "require_integer", False):
        # fail fast with the full node list before any execution
        from .trace.emitter import TraceEmitter

        TraceEmitter(g, backend=args.backend, require_integer=True)
    if args.native:
        from .trace.native import emit_trace_native

        n = emit_trace_native(g, inputs, args.output, backend=args.backend, meta=meta)
    else:
        from .trace.emitter import emit_trace

        n = emit_trace(g, inputs, path=args.output, backend=args.backend,
                       meta=meta,
                       require_integer=getattr(args, "require_integer",
                                               False))
    import os

    print(f"wrote {args.output}: {n} records, {os.path.getsize(args.output)} bytes")


def cmd_verify(args):
    from .trace.emitter import verify_trace

    graph = _load_graph(args.graph) if args.graph else None
    if args.crc_only:
        from .trace.native import native_available, native_verify

        if native_available():
            n = native_verify(args.trace)
            print(f"CRC OK: {n} records")
            return
    res = verify_trace(args.trace, graph)
    ok = res["verified"] == res["records"]
    print(f"verified {res['verified']}/{res['records']} records")
    for name, why in res["mismatches"][:20]:
        print(f"  MISMATCH {name}: {why}")
    sys.exit(0 if ok else 1)


def cmd_profile(args):
    g = _load_graph(args.graph)
    inputs = _load_inputs(args, g)
    if args.mode == "ablate":
        from .runtime.profiler import ablate_graph

        rep = ablate_graph(g, inputs, repeats=args.repeats,
                           fuse=not args.no_fuse)
        if args.format == "csv":
            print(rep.csv())
        elif args.format == "json":
            print(rep.json())
        else:
            print(rep.table())
        return
    from .runtime.profiler import profile_graph

    print("NOTE: isolated per-op times mispredict in-context cost by ~2x "
          "in both directions (fusion/overlap); use --mode=ablate for "
          "honest attribution.", file=sys.stderr)
    rep = profile_graph(g, inputs, repeats=args.repeats, fuse=not args.no_fuse)
    if args.format == "table":
        print(rep.table(top=args.top))
    elif args.format == "csv":
        print(rep.csv())
    else:
        print(rep.json())


def cmd_compile(args):
    """Quantize (unless already integer) and bundle into a .tkmod artifact
    (the `tvmc compile` analog; runtime/artifact.py)."""
    from .runtime.artifact import save_artifact

    if _is_model_file(args.model):
        g = _load_graph(args.model)
    else:
        g = _zoo(args.model, args.batch, args.image_size, args.seq_len)
    has_int = any(n.dtype in ("int8", "uint8", "int16") for n in g.nodes
                  if not n.is_var)
    if not has_int and not args.no_quantize:
        from .quantize.config import TRANSFORMER_INT8, QConfig
        from .quantize.quantizer import quantize

        batches = [_rand_inputs(g, seed=i) for i in range(args.calib_batches)]
        cfg = TRANSFORMER_INT8 if args.transformer else QConfig()
        g = quantize(g, batches, cfg)
    tune_db = None
    import os

    default_db = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tune", "tophub_v5e.jsonl")
    if os.path.exists(default_db):
        tune_db = default_db
    save_artifact(args.output, g, tune_db_path=tune_db,
                  meta={"source": args.model})
    print(f"wrote {args.output}: {len(g)} nodes, "
          f"hash {g.structural_hash()[:16]}")


def cmd_evaluate(args):
    """Quantization quality reports.

    Default: per-layer SNR + output agreement on one input batch
    (quantize/evaluate.py).  With --dataset: dataset-scale top-1/top-5
    accuracy + float-vs-int8 agreement (quantize/accuracy.py, the mrt
    `Trace.eval` analog) — per calibration mode when no quantized graph is
    given."""
    import os

    def load(path):
        if path and not os.path.exists(path) and "." not in path:
            return _zoo(path, args.batch, None, None)
        return _load_graph(path)

    fg = load(args.float_graph)
    if args.dataset:
        from .quantize.accuracy import (compare_calibrations, eval_topk,
                                        table)
        from .quantize.dataset import get_dataset

        ds = get_dataset(args.dataset, tuple(fg.inputs[0].shape),
                         samples=args.samples)
        if args.quant_graph:
            rep = eval_topk(fg, load(args.quant_graph), ds,
                            executor=args.executor, limit=args.samples)
            print(rep.row())
        else:
            reps = compare_calibrations(
                fg, ds, modes=args.modes.split(","),
                calib_samples=args.calib_samples, executor=args.executor,
                limit=args.samples)
            print(table(reps))
        return
    if not args.quant_graph:
        raise SystemExit(
            "evaluate needs a quantized graph for the SNR report, or "
            "--dataset for the accuracy harness")
    from .quantize.evaluate import quantization_report

    qg = _load_graph(args.quant_graph)
    inputs = _load_inputs(args, fg)
    rep = quantization_report(fg, qg, inputs)
    print(rep.table(worst=args.worst))


def cmd_info(args):
    g = _load_graph(args.graph)
    from collections import Counter

    ops = Counter(n.op for n in g.nodes)
    print(f"graph {g.name}: {len(g)} nodes, hash {g.structural_hash()[:16]}")
    print(f"inputs : {[(n.name, n.dtype, n.shape) for n in g.inputs]}")
    print(f"outputs: {[(o, g[o].dtype, g[o].shape) for o in g.outputs]}")
    for op, c in ops.most_common():
        print(f"  {op:<24} {c}")


def cmd_bench(args):
    import bench as bench_mod  # repo-root bench.py

    bench_mod.main()


def cmd_tune(args):
    """Tune kernel blockings for every matmul/conv workload in a graph
    (the `tvmc tune` analog); records append to the database."""
    from .ir.graph import CONST, TUPLE, TUPLE_GET_ITEM, VAR
    from .runtime.fuse import fuse_qnn
    from .tune.database import TOPHUB_PATH, TuneDatabase
    from .tune.tuner import matmul_workload, tune_conv_flat, tune_matmul

    g = _load_graph(args.graph)
    g = fuse_qnn(g)
    db = TuneDatabase(args.db or TOPHUB_PATH)
    if getattr(args, "budget", None):
        # cross-workload budget scheduler (tune/schedule.py, the
        # auto_scheduler gradient TaskScheduler analog): allocate the
        # trial budget across the model's workloads by expected e2e gain
        import json as _json

        from .tune.schedule import graph_tasks, schedule_tune

        tasks = graph_tasks(g)
        rep = schedule_tune(tasks, db, total_trials=args.budget,
                            verbose=True)
        print(_json.dumps(rep, indent=1))
        print(f"{len(db)} records in {db.path}")
        return
    done = set(db.workloads())
    seen = set()
    for n in g.nodes:
        if n.op in ("tk.dense_rq", "qnn.dense"):
            src = g[n.inputs[0]]
            wsh = g[n.inputs[1]].shape
            M = int(np.prod(src.shape[:-1]))
            K, N = int(wsh[0]), int(wsh[1])
            key = ("mm", M, K, N)
            if key in seen or matmul_workload(M, K, N, True) in done:
                continue
            seen.add(key)
            tune_matmul(M, K, N, db, fused=True)
        elif n.op in ("tk.conv2d_rq", "qnn.conv2d"):
            src = g[n.inputs[0]]
            wsh = g[n.inputs[1]].shape
            a = dict(n.attrs)
            strides = tuple(a.get("strides", (1, 1)))
            from .ops.nn import _pad4, _pair

            strides = _pair(strides)
            padding = _pad4(a.get("padding", (0, 0, 0, 0)))
            groups = int(a.get("groups", 1))
            key = ("cv", tuple(src.shape), tuple(wsh), strides, padding, groups)
            if key in seen:
                continue
            seen.add(key)
            tune_conv_flat(tuple(src.shape), tuple(wsh), strides, padding,
                           groups, db)
    print(f"{len(db)} records in {db.path}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="tachikoma_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("quantize", help="calibrate + quantize a model to an integer graph")
    q.add_argument("model", help="zoo name (lenet5/resnet50/bert/...) or graph .json")
    q.add_argument("-o", "--output", required=True)
    q.add_argument("--batch", type=int, default=1)
    q.add_argument("--image-size", type=int, default=None)
    q.add_argument("--seq-len", type=int, default=None)
    q.add_argument("--calib-data", help=".npz of calibration inputs")
    q.add_argument("--calib-batches", type=int, default=2)
    q.add_argument("--calibrate-mode", default="max", choices=["max", "minmax", "percentile", "kl"])
    q.add_argument("--transformer", action="store_true", help="use the integer-attention preset")
    q.set_defaults(fn=cmd_quantize)

    r = sub.add_parser("run", help="execute a graph artifact")
    r.add_argument("graph")
    r.add_argument("--backend", default="jax", choices=["jax", "oracle"])
    r.add_argument("--segmented", action="store_true",
                   help="segmented executor (deep models: per-layer "
                        "programs + scan; avoids oversized one-program "
                        "compiles)")
    r.add_argument("--input", help=".npy/.npz input file (random if omitted)")
    r.add_argument("-o", "--output", help="save outputs to .npz")
    r.add_argument("--no-fuse", action="store_true")
    r.set_defaults(fn=cmd_run)

    t = sub.add_parser("trace", help="emit a tachikoma-standard trace binary")
    t.add_argument("graph")
    t.add_argument("-o", "--output", required=True)
    t.add_argument("--backend", default="jax",
                   choices=["jax", "jax-segmented", "oracle"])
    t.add_argument("--input", help=".npy/.npz input file")
    t.add_argument("--native", action="store_true", help="use the C++ writer")
    t.add_argument("--require-integer", action="store_true",
                   help="reject graphs with float computational records: "
                        "every record then carries the bitwise == guarantee")
    t.set_defaults(fn=cmd_trace)

    v = sub.add_parser("verify", help="verify a trace binary")
    v.add_argument("trace")
    v.add_argument("--graph", help="graph artifact to check the hash against")
    v.add_argument("--crc-only", action="store_true")
    v.set_defaults(fn=cmd_verify)

    pr = sub.add_parser(
        "profile",
        help="timing report: --mode=ablate (cut-point, honest in-context "
             "attribution, the default) or --mode=isolated (per-op "
             "RunIndividual-style; misleading for in-context cost)")
    pr.add_argument("graph")
    pr.add_argument("--mode", default="ablate",
                    choices=["ablate", "isolated"])
    pr.add_argument("--input")
    pr.add_argument("--repeats", type=int, default=5)
    pr.add_argument("--top", type=int, default=None)
    pr.add_argument("--format", default="table", choices=["table", "csv", "json"])
    pr.add_argument("--no-fuse", action="store_true")
    pr.set_defaults(fn=cmd_profile)

    c = sub.add_parser("compile", help="quantize + bundle into a .tkmod artifact")
    c.add_argument("model", help="zoo name or model file (.json/.onnx/.tflite/.keras/.h5/.pb/SavedModel dir)")
    c.add_argument("-o", "--output", required=True)
    c.add_argument("--batch", type=int, default=1)
    c.add_argument("--image-size", type=int)
    c.add_argument("--seq-len", type=int)
    c.add_argument("--calib-batches", type=int, default=2)
    c.add_argument("--transformer", action="store_true")
    c.add_argument("--no-quantize", action="store_true")
    c.set_defaults(fn=cmd_compile)

    e = sub.add_parser("evaluate",
                       help="quantization quality: per-layer SNR, or "
                            "dataset-scale accuracy with --dataset")
    e.add_argument("float_graph", help="graph file or zoo name")
    e.add_argument("quant_graph", nargs="?")
    e.add_argument("--input")
    e.add_argument("--worst", type=int, default=15)
    e.add_argument("--dataset",
                   help="'digits' | 'synthetic' | path.npz: run the "
                        "accuracy harness instead of the SNR report")
    e.add_argument("--modes", default="max,percentile,kl",
                   help="calibration modes compared when no quantized "
                        "graph is given")
    e.add_argument("--samples", type=int, default=200)
    e.add_argument("--calib-samples", type=int, default=32)
    e.add_argument("--batch", type=int, default=32)
    e.add_argument("--executor", default="jax", choices=("jax", "oracle"))
    e.set_defaults(fn=cmd_evaluate)

    i = sub.add_parser("info", help="describe a graph artifact")
    i.add_argument("graph")
    i.set_defaults(fn=cmd_info)

    bn = sub.add_parser("bench", help="run the standard benchmark")
    bn.set_defaults(fn=cmd_bench)

    tu = sub.add_parser("tune", help="tune kernel blockings for a graph's workloads")
    tu.add_argument("graph")
    tu.add_argument("--db", help="database path (default: the packaged tophub)")
    tu.add_argument("--budget", type=int,
                    help="total trials allocated across ALL workloads by "
                         "expected gain (tune/schedule.py) instead of "
                         "per-workload searches")
    tu.set_defaults(fn=cmd_tune)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
