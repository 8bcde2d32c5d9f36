#!/bin/bash
cd /root/repo
R=bench/results
L=$R/r4_session4.log
step() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $L
  timeout 2400 "$@" >> $L 2>&1
  echo "=== rc=$? $(date -u +%H:%M:%S)" >> $L
}
step python bench.py
step python -m ofdm_uhd_tpu.cli.bench --config c1 --mode capture --caps 32 --frames 128 --input sc16 --iters 8 --jsonl $R/r4.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c2 --mode capture --caps 32 --frames 128 --input sc16 --iters 8 --jsonl $R/r4.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c4 --mode capture --caps 8 --frames 32 --iters 8 --jsonl $R/r4.jsonl
step python bench/stages.py --batch 32 --net --iters 2 --jsonl $R/stages_r4net.jsonl
echo "=== SESSION4 DONE" >> $L
