#!/bin/bash
# Single-op-per-process size scan of the axon TPU backend.
# Each probe is a fresh process; failures poison the backend server for a
# while, so sleep after each failure before the next probe.
LOG=/root/repo/tpu_size_scan.log
: > $LOG
export PYTHONPATH=/root/repo:/root/.axon_site
for spec in "1d:1024" "1d:4096" "1d:8192" "1d:16384" "1d:34756" "2d:256x1024" "2d:64x4032" "1d:131072"; do
  kind="${spec%%:*}"; size="${spec##*:}"
  echo "=== probe $spec $(date +%H:%M:%S) ===" >> $LOG
  timeout 420 python - >> $LOG 2>&1 <<EOF
import time, numpy as np, jax, jax.numpy as jnp
t0 = time.time()
kind, size = "$kind", "$size"
if kind == "1d":
    x = np.random.default_rng(0).standard_normal(int(size)).astype(np.float32)
else:
    a, b = map(int, size.split("x"))
    x = np.random.default_rng(0).standard_normal((a, b)).astype(np.float32)
try:
    y = np.asarray(jax.jit(lambda v: v * v + 1.0)(x))
    print(f"RESULT {kind}:{size} OK {time.time()-t0:.1f}s", flush=True)
except Exception as e:
    print(f"RESULT {kind}:{size} FAIL {time.time()-t0:.1f}s {str(e)[:80]}", flush=True)
EOF
  rc=$?
  if [ $rc -ne 0 ]; then echo "RESULT $spec TIMEOUT" >> $LOG; fi
  if grep -q "FAIL\|TIMEOUT" <(tail -1 $LOG); then
    echo "cooldown 300s" >> $LOG
    sleep 300
  else
    sleep 10
  fi
done
echo "scan done $(date +%H:%M:%S)" >> $LOG
