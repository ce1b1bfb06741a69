#!/bin/bash
export JAX_PLATFORMS=cpu; unset PALLAS_AXON_POOL_IPS
python scripts/accuracy_sweep.py --configs ternary_digits_stoch --seeds 3 --json-out .acc_terstoch_final.json 2>&1 | grep "^|"
