#!/usr/bin/env bash
# Probe the TPU until it answers, then run the queued measurement sequence.
# Single TPU toucher: probes are short-timeout, one at a time.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/tk_jaxcache

for i in $(seq 1 60); do
  if timeout 90 python -c "import jax; print(jax.devices())" >/tmp/tpu_probe.log 2>&1; then
    echo "TPU back at attempt $i: $(cat /tmp/tpu_probe.log | tail -1)"
    break
  fi
  echo "probe $i: down"
  sleep 240
done
if ! grep -q "TPU" /tmp/tpu_probe.log 2>/dev/null; then
  echo "TPU never recovered"; exit 1
fi
sleep 30
echo "=== chain retune (bn grid) ==="
python - <<'EOF'
import json
p = "tachikoma_tpu/tune/tophub_v5e.jsonl"
keep = [l for l in open(p) if not json.loads(l)["workload"].startswith("qconv2d_chain/")]
open(p, "w").writelines(keep)
EOF
timeout 2400 python -u scripts/tune_v5e.py
echo "=== models ==="
timeout 1500 python -u scripts/bench_models.py resnet50 bert
echo "=== bench ==="
timeout 2400 python bench.py
echo "=== queue done ==="
