#!/bin/bash
cd /root/repo
R=bench/results
L=$R/r5_session5.log
step() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $L
  timeout 2400 "$@" >> $L 2>&1
  echo "=== rc=$? $(date -u +%H:%M:%S)" >> $L
}
step python bench/stages.py --batch 32 --net --iters 3 --jsonl $R/stages_r5net.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 4096 --chunk 4128768 --ksteps 4 --resident --iters 3 --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 4096 --chunk 8257536 --ksteps 2 --resident --iters 4 --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 8192 --chunk 16515072 --ksteps 1 --resident --iters 3 --jsonl $R/r5.jsonl
step python bench.py
echo "=== SESSION5 DONE" >> $L
