#!/bin/bash
cd /root/repo
R=bench/results
L=$R/r5_session6.log
step() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $L
  timeout 2400 "$@" >> $L 2>&1
  echo "=== rc=$? $(date -u +%H:%M:%S)" >> $L
}
step python -m ofdm_uhd_tpu.cli.bench --config c4 --mode capture --caps 8 --frames 32 --iters 8 --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c4 --mode capture --caps 8 --frames 32 --iters 8 --set filter_precision=bf16 --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 4096 --chunk 4128768 --ksteps 4 --resident --iters 4 --jsonl $R/r5.jsonl
echo "=== SESSION6 DONE" >> $L
