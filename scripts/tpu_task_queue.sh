#!/usr/bin/env bash
# Flexible TPU measurement queue: pops one task per iteration from a task
# file (format: "<timeout_s>|<command>"), runs it under timeout, appends
# output to the log.  The task FILE may be edited while the runner runs
# (each iteration re-reads it atomically); the runner script itself must
# not be edited while running (bash reads scripts incrementally).
# ONE TPU toucher at a time: this runner serializes every stage.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/tk_jaxcache
LOG=${TK_QUEUE_LOG:-/tmp/tk_queue.log}
TASKS=${TK_QUEUE_TASKS:-/tmp/tk_queue_tasks.txt}

while true; do
  task=$(head -1 "$TASKS" 2>/dev/null || true)
  if [ -z "${task}" ]; then break; fi
  sed -i '1d' "$TASKS"
  tmo=${task%%|*}
  cmd=${task#*|}
  echo "=== ${cmd} ($(date +%H:%M:%S), cap ${tmo}s) ===" | tee -a "$LOG"
  timeout "$tmo" bash -c "$cmd" >>"$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" | tee -a "$LOG"
  sleep 20
done
echo "QUEUE EMPTY $(date +%H:%M:%S)" | tee -a "$LOG"
