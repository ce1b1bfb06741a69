#!/bin/bash
cd /root/repo
if timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then
  echo "=== lenet128-12k start $(date -u +%H:%M:%S) ==="
  timeout 2400 python -u scripts/calibrate_synthetic.py --config bnn_lenet --noise 2.0 --width 128 --steps 12000 --quant 2>&1 | grep -vE "WARNING|^I[0-9]" | tail -2
  echo "=== done $(date -u +%H:%M:%S) ==="
else
  echo "[queue8] tunnel wedged; skipping"
fi
