#!/bin/bash
cd /root/repo
probe() {
  for i in $(seq 1 60); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then return 0; fi
    echo "[queue4] probe $i failed $(date -u +%H:%M:%S)"; sleep 300
  done
  return 1
}
run() { t=$1; shift; label=$1; shift
  probe || { echo "[queue4] tunnel dead; abort"; exit 1; }
  echo "=== $label start $(date -u +%H:%M:%S) ==="
  timeout "$t" "$@" 2>&1 | grep -vE "WARNING|^I[0-9]" | tail -3
  echo "=== $label done $(date -u +%H:%M:%S) ==="
}
run 4800 cal-xnor12k python -u scripts/calibrate_synthetic.py --config xnor_cifar --noise 2.5 --steps 12000 --quant
