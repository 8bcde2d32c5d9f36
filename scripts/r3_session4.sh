#!/bin/bash
# Round-3 session 4: batch-32 stage profile for the roofline cross-check,
# larger-dispatch resident streaming, aligned-mode C1, final headline.
cd /root/repo
R=bench/results
L=$R/r3_session4.log
step() {
  echo "=== $(date -u +%H:%M:%S) START: $*" >> $L
  timeout 2700 "$@" >> $L 2>&1
  echo "=== $(date -u +%H:%M:%S) EXIT $?: $*" >> $L
}

# per-stage profile at the headline batch (the batch-1 profile is all
# dispatch floor) -> model-vs-measured roofline cross-check
step python bench/stages.py --batch 32 --jsonl $R/stages_r3b32.jsonl
step python bench/roofline.py --config c3 --stages-jsonl $R/stages_r3b32.jsonl

# resident streaming at larger dispatches (no upload cost -> scale K/chunk)
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 1024 --chunk 258048 --ksteps 16 --resident --iters 6 --jsonl $R/r3.jsonl

# C1 aligned mode at a batched protocol (BASELINE.md row refresh)
step python -m ofdm_uhd_tpu.cli.bench --config c1 --mode aligned --frames 4096 --iters 8 --jsonl $R/r3.jsonl

# kernel A/B net-GB/s rerun (2048-rep slope; the 144-rep slope drowned in
# floor noise)
step python bench/kernels_ab.py --iters 4 --jsonl $R/kab_r3net.jsonl

# final headline attempt of the round
step python bench.py

echo "=== $(date -u +%H:%M:%S) SESSION4 DONE" >> $L
