#!/usr/bin/env bash
# Round-3 queue part 3: deep-K decision probe, honest conv re-measurement
# (scalar feedbacks + verification gates), BERT re-measure with the
# factorized-softmax/identity-base LUT improvements, fresh bench.py.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/tk_jaxcache
LOG=/tmp/tk_r3c_queue.log

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

stage "deep-K stacked probe (R layout decision)"
timeout 2400 python -u scripts/probe_conv_stackedK.py >>"$LOG" 2>&1
sleep 30

stage "conv60 A honest re-measure (scalar feedback + verify gate)"
timeout 3000 python -u scripts/conv60_experiments.py A >>"$LOG" 2>&1
sleep 30

stage "bert re-measure (factorized softmax + identity-base LUT)"
timeout 1800 python -u scripts/bench_models.py bert >>"$LOG" 2>&1
sleep 30

stage "keras-imported MobileNetV2 int8 e2e"
timeout 1800 python -u scripts/bench_models.py keras_mnv2 >>"$LOG" 2>&1
sleep 30

stage "bench.py (driver metric)"
timeout 4800 python bench.py >>"$LOG" 2>&1

stage "queue done"
tail -5 "$LOG"
