#!/bin/bash
# r4 TPU session 1: C5 resident/host-fed sweep, C3 net stage attribution,
# C1/C2/C4 headline refresh, bench.py. Sequential — ONE tunnel process at
# a time (axon wedges under concurrency).
cd /root/repo
R=bench/results
L=$R/r4_session1.log
step() {
  echo "=== $(date -u +%H:%M:%S) $*" >> $L
  timeout 2400 "$@" >> $L 2>&1
  echo "=== rc=$? $(date -u +%H:%M:%S)" >> $L
}

# --- C5 resident chunk sweep (VERDICT item 4: finish + bank) ---
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 1024 --chunk 258048 --ksteps 16 --resident --iters 6 --jsonl $R/r4.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 1024 --chunk 258048 --ksteps 16 --resident --input sc16 --iters 6 --jsonl $R/r4.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 2048 --chunk 516096 --ksteps 8 --resident --iters 6 --jsonl $R/r4.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 2048 --chunk 516096 --ksteps 16 --resident --iters 4 --jsonl $R/r4.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 2048 --chunk 1032192 --ksteps 4 --resident --iters 4 --jsonl $R/r4.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 2048 --chunk 1032192 --ksteps 8 --resident --iters 4 --jsonl $R/r4.jsonl

# --- C5 host-fed: re-measure the sc16 K=16 cliff + bytes/dispatch control
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 512 --chunk 129024 --ksteps 8 --input sc16 --iters 6 --jsonl $R/r4.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 512 --chunk 129024 --ksteps 16 --input sc16 --iters 6 --jsonl $R/r4.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 512 --chunk 64512 --ksteps 16 --input sc16 --iters 6 --jsonl $R/r4.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 512 --chunk 64512 --ksteps 32 --input sc16 --iters 4 --jsonl $R/r4.jsonl

# --- C3 floor-free stage attribution (r3 memory item 1) ---
step python bench/stages.py --batch 1 --net --jsonl $R/stages_r4net.jsonl
step python bench/stages.py --batch 32 --net --iters 2 --jsonl $R/stages_r4net.jsonl

# --- C1/C2/C4 headline refresh ---
step python -m ofdm_uhd_tpu.cli.bench --config c1 --mode capture --caps 32 --frames 128 --input sc16 --iters 8 --jsonl $R/r4.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c1 --mode aligned --frames 4096 --iters 8 --jsonl $R/r4.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c2 --mode capture --caps 32 --frames 128 --input sc16 --iters 8 --jsonl $R/r4.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c4 --mode capture --caps 8 --frames 32 --iters 8 --jsonl $R/r4.jsonl

# --- headline ---
step python bench.py

echo "=== $(date -u +%H:%M:%S) SESSION1 DONE" >> $L
