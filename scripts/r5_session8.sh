#!/bin/bash
cd /root/repo
R=bench/results
L=$R/r5_session8.log
step() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $L
  timeout 2400 "$@" >> $L 2>&1
  echo "=== rc=$? $(date -u +%H:%M:%S)" >> $L
}
step python -m ofdm_uhd_tpu.cli.bench --config c3 --mode capture --caps 64 --frames 128 --input sc16 --iters 8 --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c3 --mode capture --caps 32 --frames 256 --input sc16 --iters 8 --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c3 --mode capture --caps 16 --frames 512 --input sc16 --iters 8 --jsonl $R/r5.jsonl
echo "=== SESSION8 DONE" >> $L
