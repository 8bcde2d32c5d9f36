#!/bin/bash
cd /root/repo
R=bench/results
L=$R/r5_session3.log
step() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $L
  timeout 3000 "$@" >> $L 2>&1
  echo "=== rc=$? $(date -u +%H:%M:%S)" >> $L
}
step python bench/kernels_ab.py --jsonl $R/kab_r5net.jsonl
echo "=== SESSION3 DONE" >> $L
