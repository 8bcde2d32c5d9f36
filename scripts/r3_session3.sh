#!/bin/bash
# Round-3 session 3: transfer-bandwidth probe, sc16/resident streaming,
# fixed halo probe, kernel A/B with the floor-free net-GB/s protocol.
cd /root/repo
R=bench/results
L=$R/r3_session3.log
step() {
  echo "=== $(date -u +%H:%M:%S) START: $*" >> $L
  timeout 2700 "$@" >> $L 2>&1
  echo "=== $(date -u +%H:%M:%S) EXIT $?: $*" >> $L
}

step python scripts/probe_h2d_tpu.py
step python scripts/probe_halo_tpu.py

# streaming at the measured sweet-spot chunk: radio-native sc16 feed (4x
# fewer host bytes) and the device-resident chain-capacity row
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 512 --chunk 129024 --ksteps 8 --input sc16 --iters 4 --jsonl $R/r3.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 512 --chunk 129024 --ksteps 16 --input sc16 --iters 4 --jsonl $R/r3.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 512 --chunk 129024 --ksteps 16 --resident --iters 6 --jsonl $R/r3.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 512 --chunk 129024 --ksteps 16 --resident --input sc16 --iters 6 --jsonl $R/r3.jsonl

# kernel A/B with net (floor-free) GB/s accounting
step python bench/kernels_ab.py --iters 4 --jsonl $R/kab_r3net.jsonl

echo "=== $(date -u +%H:%M:%S) SESSION3 DONE" >> $L
