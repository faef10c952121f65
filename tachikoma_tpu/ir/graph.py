"""Integer graph IR — the TPU-native replacement for Relay/MRT's Symbol graph.

The reference (CortexFoundation/tachikoma, a TVM fork) carries models through a
heavyweight C++ graph IR (Relay: `src/relay/ir/`) plus a slim Python Symbol
mirror used by its quantizer (`python/tvm/mrt/symbol.py:45`).  This module is
the from-scratch TPU-native equivalent: a minimal, functional, JSON-serializable
op graph whose nodes carry op identity + attrs (needed for trace emission — a
jaxpr alone loses op identity), designed so whole graphs lower to a single
jitted XLA program.

Design notes (TPU-first):
  * Nodes are immutable dataclasses; graphs are topologically-ordered lists.
    Rewrites are pure functions Graph -> Graph (like Relay passes, but plain
    Python — no C++ FFI, no visitor boilerplate).
  * Static shapes and dtypes everywhere: XLA traces once and compiles once.
  * Params live beside the graph as numpy arrays; the executor feeds them to
    jit as device-resident constants-by-argument to keep compile cache stable.
"""

from __future__ import annotations

import base64
import hashlib
import io
import json
import zlib
from dataclasses import dataclass, field, replace
from typing import Any, Callable, Iterable, Mapping, Sequence

import numpy as np

# Ops with these names are structural, not computational.
VAR = "var"      # graph input placeholder
CONST = "const"  # parameter / constant tensor
TUPLE = "tuple"              # pack multiple values
TUPLE_GET_ITEM = "tuple_get_item"  # index into a tuple node

_STRUCTURAL_OPS = (VAR, CONST, TUPLE, TUPLE_GET_ITEM)


def _canon_attr(v: Any) -> Any:
    """Canonicalize attr values to JSON-stable python types."""
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_attr(x) for x in v)
    if isinstance(v, dict):
        return {k: _canon_attr(x) for k, x in sorted(v.items())}
    return v


def _c_contig(v):
    """C-contiguous ndarray preserving 0-d shape (np.ascontiguousarray
    promotes 0-d to (1,), corrupting scalar params through round-trips)."""
    a = np.ascontiguousarray(v)
    return a.reshape(()) if np.ndim(v) == 0 else a


@dataclass(frozen=True)
class Node:
    """One op in the graph.

    Mirrors the information content of mrt's Symbol (`symbol.py:45`:
    name/op_name/args/attrs) plus inferred type, which Relay tracks via
    its type checker (`src/relay/analysis/type_solver.cc`).
    """

    name: str
    op: str
    inputs: tuple[str, ...] = ()
    attrs: Mapping[str, Any] = field(default_factory=dict)
    # Inferred static type; filled by infer_types.  None until inferred.
    shape: tuple[int, ...] | None = None
    dtype: str | None = None

    def with_(self, **kw) -> "Node":
        if "attrs" in kw:
            kw["attrs"] = dict(kw["attrs"])
        return replace(self, **kw)

    @property
    def is_var(self) -> bool:
        return self.op == VAR

    @property
    def is_const(self) -> bool:
        return self.op == CONST

    def __repr__(self) -> str:  # relay-text-ish one-liner
        ins = ", ".join(self.inputs)
        ty = f" /* {self.dtype}{list(self.shape)} */" if self.shape is not None else ""
        if self.op == VAR:
            return f"%{self.name} = var(){ty}"
        if self.op == CONST:
            return f"%{self.name} = const(){ty}"
        at = ""
        if self.attrs:
            at = ", " + ", ".join(f"{k}={v!r}" for k, v in sorted(self.attrs.items()))
        return f"%{self.name} = {self.op}({ins}{at}){ty}"


class GraphError(Exception):
    pass


@dataclass
class Graph:
    """A topologically ordered op graph plus parameters.

    Replaces the role of Relay `IRModule` + graph-executor JSON
    (`src/runtime/graph_executor/graph_executor.cc:90`) with one structure.
    """

    nodes: list[Node]
    outputs: list[str]
    params: dict[str, np.ndarray] = field(default_factory=dict)
    name: str = "main"

    def __post_init__(self):
        self._index = {n.name: i for i, n in enumerate(self.nodes)}
        if len(self._index) != len(self.nodes):
            seen: set[str] = set()
            for n in self.nodes:
                if n.name in seen:
                    raise GraphError(f"duplicate node name: {n.name}")
                seen.add(n.name)
        for i, n in enumerate(self.nodes):
            for inp in n.inputs:
                j = self._index.get(inp)
                if j is None:
                    raise GraphError(f"node {n.name} references unknown input {inp}")
                if j >= i:
                    raise GraphError(
                        f"graph not topologically sorted: {n.name} (at {i}) uses {inp} (at {j})"
                    )
        for o in self.outputs:
            if o not in self._index:
                raise GraphError(f"unknown output {o}")
        for p in self.params:
            if p not in self._index or not self.nodes[self._index[p]].is_const:
                raise GraphError(f"param {p} has no const node")

    # -- access ------------------------------------------------------------
    def __getitem__(self, name: str) -> Node:
        return self.nodes[self._index[name]]

    def __contains__(self, name: str) -> bool:
        return name in self._index

    def __iter__(self):
        return iter(self.nodes)

    def __len__(self):
        return len(self.nodes)

    @property
    def inputs(self) -> list[Node]:
        return [n for n in self.nodes if n.is_var]

    @property
    def consts(self) -> list[Node]:
        return [n for n in self.nodes if n.is_const]

    def users(self) -> dict[str, list[str]]:
        out: dict[str, list[str]] = {n.name: [] for n in self.nodes}
        for n in self.nodes:
            for i in n.inputs:
                out[i].append(n.name)
        return out

    # -- functional rewriting ---------------------------------------------
    def transform(
        self, fn: Callable[["GraphBuilder", Node, tuple[str, ...]], str | None]
    ) -> "Graph":
        """Bottom-up rewrite (mrt `Symbol.transform` style, `trace.py:21`).

        ``fn(builder, node, new_inputs)`` returns the name (in the new graph)
        replacing ``node``, or None to copy the node unchanged.  The builder
        starts empty; params referenced by copied const nodes carry over.
        """
        b = GraphBuilder(name=self.name)
        mapping: dict[str, str] = {}
        for n in self.nodes:
            new_inputs = tuple(mapping[i] for i in n.inputs)
            res = fn(b, n, new_inputs)
            if res is None:
                if n.is_const:
                    res = b.const(self.params[n.name], name=n.name)
                elif n.is_var:
                    res = b.var(n.name, n.shape, n.dtype)
                else:
                    res = b.call(n.op, *new_inputs, name=n.name, **dict(n.attrs))
            mapping[n.name] = res
        return b.build([mapping[o] for o in self.outputs])

    def dead_code_eliminate(self) -> "Graph":
        live: set[str] = set()
        stack = list(self.outputs)
        while stack:
            cur = stack.pop()
            if cur in live:
                continue
            live.add(cur)
            stack.extend(self[cur].inputs)
        nodes = [n for n in self.nodes if n.name in live]
        params = {k: v for k, v in self.params.items() if k in live}
        return Graph(nodes, list(self.outputs), params, self.name)

    # -- structural identity ----------------------------------------------
    def structural_bytes(self, include_params: bool = False) -> bytes:
        """Deterministic byte encoding used for hashing/equality.

        Node names are alpha-renamed by topological position so that equality
        is structural (the role of `StructuralEqual`,
        `include/tvm/node/structural_equal.h:103`).
        """
        rename = {n.name: f"%{i}" for i, n in enumerate(self.nodes)}
        items = []
        for n in self.nodes:
            items.append(
                (
                    rename[n.name],
                    n.op,
                    tuple(rename[i] for i in n.inputs),
                    _canon_attr(dict(n.attrs)),
                    list(n.shape) if n.shape is not None else None,
                    n.dtype,
                )
            )
        enc = json.dumps(
            {"nodes": items, "outputs": [rename[o] for o in self.outputs]},
            sort_keys=True,
            separators=(",", ":"),
            default=_canon_attr,
        ).encode()
        if include_params:
            h = hashlib.sha256(enc)
            for n in self.nodes:
                if n.is_const:
                    a = _c_contig(self.params[n.name])
                    h.update(rename[n.name].encode())
                    h.update(str(a.dtype).encode())
                    h.update(str(a.shape).encode())
                    h.update(a.tobytes())
            return h.digest()
        return enc

    def structural_hash(self, include_params: bool = False) -> str:
        return hashlib.sha256(self.structural_bytes(include_params)).hexdigest()

    def structural_equal(self, other: "Graph", include_params: bool = False) -> bool:
        if include_params:
            return self.structural_bytes(True) == other.structural_bytes(True)
        return self.structural_bytes() == other.structural_bytes()

    # -- serialization ------------------------------------------------------
    # Replaces SaveJSON/LoadJSON (`include/tvm/node/serialization.h:39-48`)
    # and save_param_dict (`python/tvm/runtime/params.py:22`).
    def to_json(self, include_params: bool = True) -> str:
        d: dict[str, Any] = {
            "format": "tachikoma_tpu.graph.v1",
            "name": self.name,
            "nodes": [
                {
                    "name": n.name,
                    "op": n.op,
                    "inputs": list(n.inputs),
                    "attrs": _canon_attr(dict(n.attrs)),
                    "shape": list(n.shape) if n.shape is not None else None,
                    "dtype": n.dtype,
                }
                for n in self.nodes
            ],
            "outputs": list(self.outputs),
        }
        if include_params:
            pd = {}
            for k, v in self.params.items():
                buf = io.BytesIO()
                np.save(buf, _c_contig(v), allow_pickle=False)
                pd[k] = base64.b64encode(zlib.compress(buf.getvalue())).decode()
            d["params"] = pd
        return json.dumps(d, sort_keys=True, default=_canon_attr)

    @classmethod
    def from_json(cls, s: str, params: dict[str, np.ndarray] | None = None) -> "Graph":
        d = json.loads(s)
        if d.get("format") != "tachikoma_tpu.graph.v1":
            raise GraphError(f"unknown graph format {d.get('format')!r}")
        nodes = [
            Node(
                name=nd["name"],
                op=nd["op"],
                inputs=tuple(nd["inputs"]),
                attrs={k: tuple(v) if isinstance(v, list) else v for k, v in nd["attrs"].items()},
                shape=tuple(nd["shape"]) if nd["shape"] is not None else None,
                dtype=nd["dtype"],
            )
            for nd in d["nodes"]
        ]
        if params is None:
            params = {}
            for k, v in d.get("params", {}).items():
                raw = zlib.decompress(base64.b64decode(v))
                params[k] = np.load(io.BytesIO(raw), allow_pickle=False)
        return cls(nodes, list(d["outputs"]), params, d.get("name", "main"))

    def __repr__(self) -> str:
        lines = [f"graph @{self.name} ({len(self.nodes)} nodes)"]
        lines += [f"  {n!r}" for n in self.nodes]
        lines.append("  return " + ", ".join(f"%{o}" for o in self.outputs))
        return "\n".join(lines)


class GraphBuilder:
    """Convenience builder producing topologically sorted graphs.

    The model-zoo and importer layer use this instead of Relay's expr
    constructors (`python/tvm/relay/expr.py`).
    """

    def __init__(self, name: str = "main"):
        self.name = name
        self.nodes: list[Node] = []
        self.params: dict[str, np.ndarray] = {}
        self._names: set[str] = set()
        self._counter: dict[str, int] = {}
        self._const_cache: dict[tuple, str] = {}

    def fresh(self, hint: str) -> str:
        if hint not in self._names:
            self._names.add(hint)
            return hint
        while True:
            c = self._counter.get(hint, 0) + 1
            self._counter[hint] = c
            cand = f"{hint}_{c}"
            if cand not in self._names:
                self._names.add(cand)
                return cand

    def _add(self, node: Node) -> str:
        self.nodes.append(node)
        return node.name

    def annotate(self, name: str, **attrs) -> str:
        """Attach/overwrite attrs on an already-added node (e.g. marking an
        imported constant with its source quantization parameters)."""
        for i in range(len(self.nodes) - 1, -1, -1):
            if self.nodes[i].name == name:
                merged = dict(self.nodes[i].attrs)
                merged.update({k: _canon_attr(v) for k, v in attrs.items()
                               if v is not None})
                self.nodes[i] = self.nodes[i].with_(attrs=merged)
                return name
        raise KeyError(name)

    def var(self, name: str, shape: Sequence[int] | None, dtype: str | None) -> str:
        return self._add(
            Node(
                self.fresh(name),
                VAR,
                shape=tuple(shape) if shape is not None else None,
                dtype=dtype,
            )
        )

    def const(self, value: np.ndarray | float | int, name: str | None = None, dtype: str | None = None) -> str:
        value = np.asarray(value, dtype=dtype)
        if name is None:
            # Dedupe anonymous scalar constants for graph hygiene.
            if value.ndim == 0:
                key = (str(value.dtype), value.item())
                hit = self._const_cache.get(key)
                if hit is not None:
                    return hit
            name = self.fresh("c")
        else:
            name = self.fresh(name)
        self.params[name] = value
        self._add(Node(name, CONST, shape=tuple(value.shape), dtype=str(value.dtype)))
        if value.ndim == 0:
            self._const_cache[(str(value.dtype), value.item())] = name
        return name

    def call(self, op: str, *inputs: str, name: str | None = None, **attrs) -> str:
        nm = self.fresh(name if name is not None else op.replace(".", "_"))
        canon = {k: _canon_attr(v) for k, v in attrs.items() if v is not None}
        return self._add(Node(nm, op, tuple(inputs), canon))

    def tuple_(self, *inputs: str, name: str | None = None) -> str:
        return self.call(TUPLE, *inputs, name=name)

    def get_item(self, src: str, index: int, name: str | None = None) -> str:
        return self.call(TUPLE_GET_ITEM, src, name=name, index=index)

    def build(self, outputs: Sequence[str] | str) -> Graph:
        if isinstance(outputs, str):
            outputs = [outputs]
        g = Graph(list(self.nodes), list(outputs), dict(self.params), self.name)
        return g.dead_code_eliminate()
