#!/bin/bash
# Round-5 session 1: auto-validation grid (VERDICT r4 item 2) with the
# Pallas DMA extraction live — every config xla vs auto, the missing
# C4-auto row, C5 resident under auto (fused-viterbi routing), aligned
# C1 under both (item 7), and the batched stage attribution.
cd /root/repo
R=bench/results
L=$R/r5_session1.log
step() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $L
  timeout 2400 "$@" >> $L 2>&1
  echo "=== rc=$? $(date -u +%H:%M:%S)" >> $L
}
step python bench.py
step python -m ofdm_uhd_tpu.cli.bench --config c1 --mode capture --caps 32 --frames 128 --input sc16 --iters 8 --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c1 --mode capture --caps 32 --frames 128 --input sc16 --iters 8 --set kernel_backend=auto --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c2 --mode capture --caps 32 --frames 128 --input sc16 --iters 8 --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c2 --mode capture --caps 32 --frames 128 --input sc16 --iters 8 --set kernel_backend=auto --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c4 --mode capture --caps 8 --frames 32 --iters 8 --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c4 --mode capture --caps 8 --frames 32 --iters 8 --set kernel_backend=auto --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c1 --mode aligned --frames 4096 --iters 8 --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c1 --mode aligned --frames 4096 --iters 8 --set kernel_backend=auto --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 4096 --chunk 8257536 --ksteps 2 --resident --iters 3 --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 4096 --chunk 8257536 --ksteps 2 --resident --iters 3 --set kernel_backend=auto --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 512 --chunk 129024 --ksteps 16 --input sc16 --iters 6 --jsonl $R/r5.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 512 --chunk 129024 --ksteps 16 --input sc16 --iters 6 --set kernel_backend=auto --jsonl $R/r5.jsonl
step python bench/stages.py --batch 32 --net --iters 2 --jsonl $R/stages_r5net.jsonl
echo "=== SESSION1 DONE" >> $L
