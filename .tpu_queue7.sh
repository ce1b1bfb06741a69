#!/bin/bash
cd /root/repo
while ps aux | grep -q "[t]pu_queue6.sh"; do sleep 60; done
probe() {
  for i in $(seq 1 20); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then return 0; fi
    echo "[queue7] probe $i failed $(date -u +%H:%M:%S)"; sleep 240
  done
  return 1
}
probe || { echo "[queue7] tunnel dead; abort"; exit 1; }
echo "=== dorefa-w4-sweep start $(date -u +%H:%M:%S) ==="
timeout 2400 python -u scripts/accuracy_sweep.py --configs dorefa_resnet20_w4 --json-out /tmp/acc_tpu_dorefa_w4.json 2>&1 | grep -vE "WARNING|^I[0-9]" | tail -5
echo "=== done $(date -u +%H:%M:%S) ==="
