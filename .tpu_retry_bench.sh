#!/bin/bash
# retry loop: probe the axon tunnel; when alive, run bench.py on TPU once.
cd /root/repo
for i in $(seq 1 40); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then
    echo "[retry-bench] TPU alive on attempt $i at $(date -u +%H:%M:%S); running bench"
    QTPU_BENCH_NO_PROBE=1 timeout 560 python bench.py 2>bench_tpu_stderr.log
    rc=$?
    echo "[retry-bench] bench exit=$rc"
    if [ $rc -eq 0 ] && [ -f BENCH_TPU_LAST_GOOD.json ]; then
      echo "[retry-bench] last-good captured:"; cat BENCH_TPU_LAST_GOOD.json
      exit 0
    fi
  else
    echo "[retry-bench] probe $i failed at $(date -u +%H:%M:%S)"
  fi
  sleep 600
done
echo "[retry-bench] gave up after 40 attempts"
exit 1
