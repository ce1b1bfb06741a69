#!/bin/bash
# run smoke2 once the decode bench finishes (accuracy-run contention is
# acceptable: it slows training, never corrupts results)
LOG=.tpu_smoke2.log
for i in $(seq 1 120); do
  [ -f .perf_decode_r5.md ] && break
  sleep 30
done
sleep 30
timeout 600 python .tpu_smoke_decode2.py >> "$LOG" 2>&1
echo "exit $?" >> "$LOG"
