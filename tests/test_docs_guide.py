"""docs/GUIDE.md snippets stay runnable (executes the python blocks that
form the section-1..5 walkthrough, in order, in one namespace)."""

import os
import re

import numpy as np
import pytest


def test_guide_snippets_run():
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "GUIDE.md")
    src = open(path).read()
    blocks = re.findall(r"```python\n(.*?)```", src, re.S)
    assert len(blocks) >= 5
    ns: dict = {}
    skip_markers = ("from_onnx(", "from_tflite(\"model", "ShardedExecutor")
    for blk in blocks:
        runnable = "\n".join(
            ln for ln in blk.splitlines()
            if not any(m in ln for m in skip_markers)
            or ln.strip().startswith(("from ", "import ")))
        exec(compile(runnable, path, "exec"), ns)  # noqa: S102
    # the walkthrough produced a quantized graph whose oracle/XLA agree
    ref, out = ns["ref"], ns["out"]
    for a, b in zip(ref, out):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind in "iu":
            assert (a == b).all()
    assert ns["verify_trace"] is not None
