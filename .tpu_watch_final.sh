#!/bin/bash
# final: after the tail accuracy runs, re-measure the decode section with
# the committed HIGHEST-precision kernel, then refresh the headline bench.
LOG=.tpu_final_r5.log
for i in $(seq 1 400); do
  [ -f .acc_bnn_w192.json ] && break
  sleep 60
done
echo "[final] tail done" >> "$LOG"
./.tpu_queue_r5.sh "$LOG" python scripts/perf_bench.py --sections decode --out .perf_decode_r5b.md
./.tpu_queue_r5.sh "$LOG" python bench.py
