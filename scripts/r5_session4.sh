#!/bin/bash
cd /root/repo
R=bench/results
L=$R/r5_session4.log
step() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $L
  timeout 2400 "$@" >> $L 2>&1
  echo "=== rc=$? $(date -u +%H:%M:%S)" >> $L
}
step python bench/kernels_ab.py --only viterbi-6912-b4160,viterbi-win-6912-b4160 --iters 8 --jsonl $R/kab_r5net.jsonl
step python bench/stages.py --batch 32 --net --iters 3 --jsonl $R/stages_r5net.jsonl
echo "=== SESSION4 DONE" >> $L
