"""Deployable artifact bundles — save/load a compiled model as one file.

The role of the reference's `Module.export_library` / `load_module`
(`python/tvm/runtime/module.py:397,568`) and graph-JSON + param-dict
artifacts (`python/tvm/runtime/params.py:22,54`): a `.tkmod` file is a tar
containing the graph (structure JSON), parameters (npz), optional tuning
database, and a manifest with hashes — everything needed to run or to
resume trace generation elsewhere.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import numpy as np

from ..utils import dtypes as dt

from ..ir.graph import Graph

FORMAT = "tachikoma_tpu.artifact.v1"


def save_artifact(path: str, graph: Graph, tune_db_path: str | None = None,
                  meta: dict | None = None) -> None:
    manifest = {
        "format": FORMAT,
        "graph_hash": graph.structural_hash(include_params=True),
        "name": graph.name,
        "num_nodes": len(graph),
        "inputs": [(n.name, n.dtype, list(n.shape or ())) for n in graph.inputs],
        "outputs": list(graph.outputs),
        "meta": meta or {},
    }

    def add_bytes(tar, name, data: bytes):
        info = tarfile.TarInfo(name)
        info.size = len(data)
        info.mtime = 0  # deterministic archives
        tar.addfile(info, io.BytesIO(data))

    import gzip

    raw = open(path, "wb")
    gz = gzip.GzipFile(filename="", mode="wb", fileobj=raw, mtime=0)
    with tarfile.open(fileobj=gz, mode="w", format=tarfile.USTAR_FORMAT) as tar:
        add_bytes(tar, "manifest.json", json.dumps(manifest, sort_keys=True).encode())
        add_bytes(tar, "graph.json", graph.to_json(include_params=False).encode())
        # one .npy per param (np.savez embeds zip timestamps; tar entries
        # here carry mtime=0, keeping artifact bytes deterministic)
        for k in sorted(graph.params):
            buf = io.BytesIO()
            np.save(buf, dt.c_contig(graph.params[k]), allow_pickle=False)
            add_bytes(tar, f"params/{k}.npy", buf.getvalue())
        if tune_db_path and os.path.exists(tune_db_path):
            with open(tune_db_path, "rb") as f:
                add_bytes(tar, "tune.jsonl", f.read())
    gz.close()
    raw.close()


def load_artifact(path: str) -> tuple[Graph, dict]:
    """Returns (graph, manifest); verifies the parameter hash."""
    with tarfile.open(path, "r:gz") as tar:
        def read(name):
            f = tar.extractfile(name)
            assert f is not None, f"missing {name} in artifact"
            return f.read()

        manifest = json.loads(read("manifest.json"))
        if manifest.get("format") != FORMAT:
            raise ValueError(f"unknown artifact format {manifest.get('format')!r}")
        gjson = read("graph.json").decode()
        params = {}
        for member in tar.getmembers():
            if member.name.startswith("params/") and member.name.endswith(".npy"):
                key = member.name[len("params/"):-len(".npy")]
                params[key] = np.load(io.BytesIO(read(member.name)), allow_pickle=False)
        graph = Graph.from_json(gjson, params=params)
        got = graph.structural_hash(include_params=True)
        if got != manifest["graph_hash"]:
            raise ValueError(
                f"artifact hash mismatch: manifest {manifest['graph_hash'][:16]} "
                f"vs content {got[:16]}"
            )
        tune_data = None
        try:
            tune_data = read("tune.jsonl")
        except (KeyError, AssertionError):
            pass
        if tune_data is not None:
            manifest["_tune_jsonl"] = tune_data.decode()
    return graph, manifest
