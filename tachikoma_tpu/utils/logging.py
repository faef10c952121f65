"""Logging configuration with per-module env-controlled verbosity.

The role of the reference's `TVM_LOG_DEBUG` spec parsing
(`src/runtime/logging.cc`): `TK_LOG="quantize=DEBUG;gather=INFO;default=WARNING"`
sets per-subsystem levels under the `tachikoma_tpu` logger namespace.
"""

from __future__ import annotations

import logging
import os

_CONFIGURED = False


def configure(spec: str | None = None) -> None:
    """Apply a TK_LOG-style spec (idempotent; called on package import)."""
    global _CONFIGURED
    spec = spec if spec is not None else os.environ.get("TK_LOG", "")
    root = logging.getLogger("tachikoma_tpu")
    if not _CONFIGURED:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("[%(levelname)s %(name)s] %(message)s")
        )
        root.addHandler(handler)
        root.setLevel(logging.WARNING)
        root.propagate = False
        _CONFIGURED = True
    if not spec:
        return
    for part in spec.split(";"):
        part = part.strip()
        if not part or "=" not in part:
            continue
        name, _, level = part.partition("=")
        level_no = getattr(logging, level.strip().upper(), None)
        if level_no is None:
            continue
        if name.strip() == "default":
            root.setLevel(level_no)
        else:
            logging.getLogger(f"tachikoma_tpu.{name.strip()}").setLevel(level_no)


def get_logger(subsystem: str) -> logging.Logger:
    configure()
    return logging.getLogger(f"tachikoma_tpu.{subsystem}")
