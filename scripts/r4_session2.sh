#!/bin/bash
cd /root/repo
R=bench/results
L=$R/r4_session2.log
step() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $L
  timeout 2400 "$@" >> $L 2>&1
  echo "=== rc=$? $(date -u +%H:%M:%S)" >> $L
}
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 4096 --chunk 2064384 --ksteps 4 --resident --iters 4 --jsonl $R/r4.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 4096 --chunk 2064384 --ksteps 2 --resident --iters 4 --jsonl $R/r4.jsonl
step python bench/stages.py --batch 32 --net --iters 2 --jsonl $R/stages_r4net.jsonl
step python bench/stages.py --batch 1 --net --jsonl $R/stages_r4net.jsonl
step python bench/kernels_ab.py --only viterbi-win1024 --jsonl $R/kab_r4net.jsonl
echo "=== SESSION2 DONE" >> $L
