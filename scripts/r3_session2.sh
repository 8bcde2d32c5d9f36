#!/bin/bash
# Round-3 follow-up: streaming with production-size chunks (the K-step scan
# amortizes the dispatch floor; the chunk size amortizes per-chunk work),
# plus a headline re-run with the bm-antisymmetry + packed-traceback
# decoders.
cd /root/repo
R=bench/results
L=$R/r3_session2.log
step() {
  echo "=== $(date -u +%H:%M:%S) START: $*" >> $L
  timeout 2700 "$@" >> $L 2>&1
  echo "=== $(date -u +%H:%M:%S) EXIT $?: $*" >> $L
}

# streaming: chunk x ksteps sweep at C5 (frames/s is the judged unit)
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 512 --chunk 129024 --ksteps 8 --iters 4 --jsonl $R/r3.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 512 --chunk 516096 --ksteps 8 --iters 4 --jsonl $R/r3.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 1024 --chunk 516096 --ksteps 16 --iters 3 --jsonl $R/r3.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 1024 --chunk 1032192 --ksteps 8 --iters 3 --jsonl $R/r3.jsonl

# C4 re-runs with the detection-slack fix (the 01:38/01:55 rows decoded
# only half their frames — alternate-frame skip, fixed in phy/sync.py)
step python -m ofdm_uhd_tpu.cli.bench --config c4 --caps 8 --frames 32 --iters 8 --jsonl $R/r3.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c4 --caps 8 --frames 32 --iters 8 --set kernel_backend=auto --jsonl $R/r3.jsonl

# headline with the r3 decoder optimizations in place
step python bench.py

echo "=== $(date -u +%H:%M:%S) SESSION2 DONE" >> $L
