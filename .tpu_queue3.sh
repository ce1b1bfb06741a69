#!/bin/bash
cd /root/repo
# wait for queue2 to finish
while ps aux | grep -q "[t]pu_queue2.sh"; do sleep 60; done
probe() {
  for i in $(seq 1 60); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then return 0; fi
    echo "[queue3] probe $i failed $(date -u +%H:%M:%S)"; sleep 300
  done
  return 1
}
run() { t=$1; shift; label=$1; shift
  probe || { echo "[queue3] tunnel dead; abort"; exit 1; }
  echo "=== $label start $(date -u +%H:%M:%S) ==="
  timeout "$t" "$@" 2>&1 | grep -vE "WARNING|^I[0-9]" | tail -3
  echo "=== $label done $(date -u +%H:%M:%S) ==="
}
run 3600 cal-xnor6k   python -u scripts/calibrate_synthetic.py --config xnor_cifar --noise 2.5 --steps 6000 --quant
run 3600 cal-dorefa6k python -u scripts/calibrate_synthetic.py --config dorefa_resnet20 --noise 2.5 --steps 6000 --quant
run 3600 cal-lenet128 python -u scripts/calibrate_synthetic.py --config bnn_lenet --noise 2.0 --width 128 --steps 8000 --quant
echo "=== queue3 complete $(date -u +%H:%M:%S) ==="
