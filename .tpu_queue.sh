#!/bin/bash
cd /root/repo
echo "=== queue start $(date -u +%H:%M:%S) ==="
for cfg in xnor_cifar dorefa_resnet20 logquant_vgg; do
  echo "=== calibrate $cfg ==="
  timeout 2400 python scripts/calibrate_synthetic.py --config $cfg --noise 2.5 --quant 2>&1 | grep -v WARNING | tail -2
done
echo "=== perf models w64 ==="
timeout 2400 python scripts/perf_bench.py --sections models --out /tmp/PERF_models_r4b.md 2>&1 | grep -E "^#" | tail -12
echo "=== fresh bench last-good ==="
QTPU_BENCH_NO_PROBE=1 timeout 560 python bench.py 2>&1 | tail -8
echo "=== queue done $(date -u +%H:%M:%S) ==="
