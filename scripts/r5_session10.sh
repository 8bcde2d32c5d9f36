#!/bin/bash
cd /root/repo
R=bench/results
L=$R/r5_session10.log
step() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $L
  timeout 2400 "$@" >> $L 2>&1
  echo "=== rc=$? $(date -u +%H:%M:%S)" >> $L
}
step python bench/stages.py --batch 8 --frames 1024 --net --iters 3 --backend auto --jsonl $R/stages_r5net.jsonl
echo "=== SESSION10 DONE" >> $L
