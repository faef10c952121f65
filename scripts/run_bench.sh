#!/usr/bin/env bash
# Device benchmark (one JSON line on stdout). Uses the default jax device:
# the real TPU under axon, CPU otherwise.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python bench.py "$@"
