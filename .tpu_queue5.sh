#!/bin/bash
cd /root/repo
probe() {
  for i in $(seq 1 40); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then return 0; fi
    echo "[queue5] probe $i failed $(date -u +%H:%M:%S)"; sleep 240
  done
  return 1
}
probe || { echo "[queue5] tunnel dead; abort"; exit 1; }
echo "=== dorefa-preact-6k start $(date -u +%H:%M:%S) ==="
timeout 3600 python -u scripts/accuracy_sweep.py --configs dorefa_resnet20 --json-out /tmp/acc_tpu_dorefa.json 2>&1 | grep -vE "WARNING|^I[0-9]" | tail -6
echo "=== done $(date -u +%H:%M:%S) ==="
