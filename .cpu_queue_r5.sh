#!/bin/bash
# CPU 3-seed evidence runs at the FINAL configs (waits for exp4 probes).
while pgrep -f "acc_zoo_exp4" > /dev/null 2>&1; do sleep 30; done
export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS
python scripts/accuracy_sweep.py --configs elastic_digits binaryconnect_digits_stoch dorefa_digits_g6 ternary_digits --seeds 3 --json-out .acc_zoo_final.json 2>&1 | grep "^|"
python scripts/accuracy_sweep.py --configs binaryconnect_digits xnor_digits xnor_digits_a1 --seeds 3 --json-out .acc_anchors_final.json 2>&1 | grep "^|"
