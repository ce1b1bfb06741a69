#!/bin/bash
# probe-gated TPU work queue: every item waits for a live tunnel first.
cd /root/repo
probe() {
  for i in $(seq 1 60); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then
      return 0
    fi
    echo "[queue2] probe $i failed $(date -u +%H:%M:%S)"; sleep 300
  done
  return 1
}
run() {  # run <timeout> <label> <cmd...>
  t=$1; shift; label=$1; shift
  probe || { echo "[queue2] tunnel never recovered; abort"; exit 1; }
  echo "=== $label start $(date -u +%H:%M:%S) ==="
  timeout "$t" "$@" 2>&1 | grep -vE "WARNING|^I[0-9]" | tail -4
  echo "=== $label done $(date -u +%H:%M:%S) rc=$? ==="
}
run 2400 cal-xnor    python -u scripts/calibrate_synthetic.py --config xnor_cifar --noise 2.5 --quant
run 2400 cal-dorefa  python -u scripts/calibrate_synthetic.py --config dorefa_resnet20 --noise 2.5 --quant
run 2400 cal-logvgg  python -u scripts/calibrate_synthetic.py --config logquant_vgg --noise 2.5 --quant
run 2400 cal-lenet96 python -u scripts/calibrate_synthetic.py --config bnn_lenet --noise 2.0 --width 96 --steps 4000 --quant
run 2400 perf-w64    python -u scripts/perf_bench.py --sections models conv --out /tmp/PERF_models_r4b.md
export QTPU_BENCH_NO_PROBE=1
run 560 bench-fresh python -u bench.py
echo "=== queue2 complete $(date -u +%H:%M:%S) ==="
