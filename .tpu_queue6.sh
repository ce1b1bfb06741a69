#!/bin/bash
cd /root/repo
while ps aux | grep -q "[t]pu_queue5.sh"; do sleep 60; done
probe() {
  for i in $(seq 1 40); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then return 0; fi
    echo "[queue6] probe $i failed $(date -u +%H:%M:%S)"; sleep 240
  done
  return 1
}
probe || { echo "[queue6] tunnel dead; abort"; exit 1; }
echo "=== perf-models-preact start $(date -u +%H:%M:%S) ==="
timeout 2800 python -u scripts/perf_bench.py --sections models --out /tmp/PERF_models_preact.md 2>&1 | grep -E "^#" | tail -10
echo "=== done $(date -u +%H:%M:%S) ==="
echo "=== bench-lastgood start $(date -u +%H:%M:%S) ==="
QTPU_BENCH_NO_PROBE=1 timeout 560 python -u bench.py 2>&1 | tail -3
echo "=== done $(date -u +%H:%M:%S) ==="
