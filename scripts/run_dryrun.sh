#!/usr/bin/env bash
# Multi-chip dry run on N virtual CPU devices (default 8).
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-8}"
JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=$N" \
  exec python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as ge
ge.dryrun_multichip($N)
"
