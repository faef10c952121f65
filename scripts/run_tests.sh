#!/usr/bin/env bash
# CPU test suite (the task_python_unittest.sh analog). Runs on a virtual
# 8-device mesh; safe without TPU hardware.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q "$@"
