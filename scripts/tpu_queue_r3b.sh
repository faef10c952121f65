#!/usr/bin/env bash
# Round-3 follow-up queue: corrected conv60 experiments (verified variants,
# full-output feedbacks), the model benches the first queue never reached,
# then bench.py.  Same rules as tpu_recovery_queue.sh: ONE TPU toucher,
# gentle probing, every stage under timeout, output appended to the log.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/tk_jaxcache
LOG=/tmp/tk_r3b_queue.log

stage() {
  echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
}

for i in $(seq 1 12); do
  if timeout 1200 python -c "import jax; print(jax.devices())" >/tmp/tpu_probe.log 2>&1; then
    echo "TPU alive at attempt $i" | tee -a "$LOG"
    break
  fi
  echo "probe $i: down ($(date +%H:%M))" | tee -a "$LOG"
  sleep 600
done
if ! grep -q "TPU" /tmp/tpu_probe.log 2>/dev/null; then
  echo "TPU never recovered" | tee -a "$LOG"; exit 1
fi
sleep 30

stage "conv60 corrected (A verified variants, B chains, C slow families)"
timeout 4500 python -u scripts/conv60_experiments.py >>"$LOG" 2>&1
sleep 30

stage "models e2e: vit_b"
timeout 1800 python -u scripts/bench_models.py vit_b >>"$LOG" 2>&1
sleep 30
stage "models e2e: vitl (segmented)"
timeout 2700 python -u scripts/bench_models.py vitl >>"$LOG" 2>&1
sleep 30
stage "models e2e: gpt2 + decode"
timeout 2700 python -u scripts/bench_models.py gpt2 gpt2_decode >>"$LOG" 2>&1
sleep 30
stage "models e2e: scan-compiled variants"
timeout 2700 python -u scripts/bench_models.py vitl_scan gpt2_scan >>"$LOG" 2>&1
sleep 30

stage "bench.py (driver metric)"
timeout 4800 python bench.py >>"$LOG" 2>&1

stage "queue done"
tail -5 "$LOG"
