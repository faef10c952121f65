#!/usr/bin/env bash
# Probe the TPU until it answers, then run the round-3 measurement queue.
# Single TPU toucher: probes are short-timeout, one at a time; every stage
# runs under timeout and appends to /tmp/tk_r3_queue.log.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/tk_jaxcache
LOG=/tmp/tk_r3_queue.log

stage() {
  echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
}

# GENTLE probing: a killed backend-init re-wedges the tunnel (round-2
# lesson), so short-timeout probe loops can perpetuate the outage.  Probe
# with a LONG timeout (first contact after a wedge can take minutes) and a
# LONG cooldown between attempts.
for i in $(seq 1 18); do
  if timeout 1200 python -c "import jax; print(jax.devices())" >/tmp/tpu_probe.log 2>&1; then
    echo "TPU back at attempt $i: $(tail -1 /tmp/tpu_probe.log)" | tee -a "$LOG"
    break
  fi
  echo "probe $i: down ($(date +%H:%M))" | tee -a "$LOG"
  sleep 600
done
if ! grep -q "TPU" /tmp/tpu_probe.log 2>/dev/null; then
  echo "TPU never recovered" | tee -a "$LOG"; exit 1
fi
sleep 30

stage "conv60 experiments (A raw variants, B chains, C slow families)"
timeout 3600 python -u scripts/conv60_experiments.py >>"$LOG" 2>&1
sleep 30

stage "models e2e (incl. segmented vitl/gpt2)"
timeout 2700 python -u scripts/bench_models.py resnet50 mobilenet bert >>"$LOG" 2>&1
sleep 30
timeout 1800 python -u scripts/bench_models.py vit_b >>"$LOG" 2>&1
sleep 30
timeout 2700 python -u scripts/bench_models.py vitl >>"$LOG" 2>&1
sleep 30
timeout 2700 python -u scripts/bench_models.py gpt2 gpt2_decode >>"$LOG" 2>&1
sleep 30
timeout 2700 python -u scripts/bench_models.py vitl_scan gpt2_scan >>"$LOG" 2>&1
sleep 30

stage "bench.py (driver metric)"
timeout 4800 python bench.py >>"$LOG" 2>&1

stage "queue done"
tail -5 "$LOG"
