#!/bin/bash
cd /root/repo
R=bench/results
L=$R/r5_session11.log
step() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $L
  timeout 2400 "$@" >> $L 2>&1
  echo "=== rc=$? $(date -u +%H:%M:%S)" >> $L
}
step python -m ofdm_uhd_tpu.cli.bench --config c3 --mode capture --caps 4 --frames 2048 --input sc16 --iters 8 --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c3 --mode capture --caps 8 --frames 1024 --input sc16 --iters 8 --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c3 --mode capture --caps 2 --frames 4096 --input sc16 --iters 6 --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 4096 --chunk 4128768 --ksteps 4 --resident --iters 4 --jsonl $R/r5.jsonl
echo "=== SESSION11 DONE" >> $L
