#!/bin/bash
# Round-3 on-chip bench session: banks every VERDICT r2 measurement item.
# Sequential (one chip); each step logs to bench/results/r3_session.log.
cd /root/repo
R=bench/results
L=$R/r3_session.log
mkdir -p $R
step() {
  echo "=== $(date -u +%H:%M:%S) START: $*" >> $L
  timeout 2700 "$@" >> $L 2>&1
  echo "=== $(date -u +%H:%M:%S) EXIT $?: $*" >> $L
}

# 1. headline (VERDICT item 3): C3 at the new parallel-detect/fused-CFO chain
step python bench.py

# 2. C1/C2 at the C3 protocol (item 2): 32 caps/dispatch, sc16
step python -m ofdm_uhd_tpu.cli.bench --config c1 --caps 32 --frames 128 --input sc16 --iters 8 --jsonl $R/r3.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c1 --caps 32 --frames 128 --input sc16 --iters 8 --set kernel_backend=auto --jsonl $R/r3.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c2 --caps 32 --frames 128 --input sc16 --iters 8 --jsonl $R/r3.jsonl

# 3. streaming C5 (item 1): K-step device-resident dispatch, TRACK on/off (item 7)
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 128 --ksteps 16 --iters 5 --jsonl $R/r3.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 128 --ksteps 16 --iters 5 --no-track --jsonl $R/r3.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c5 --mode stream --frames 128 --ksteps 1 --iters 3 --jsonl $R/r3.jsonl

# 4. C4 re-bench (auto backend picks the Pallas interp/decim winners)
step python -m ofdm_uhd_tpu.cli.bench --config c4 --caps 8 --frames 32 --iters 8 --jsonl $R/r3.jsonl
step python -m ofdm_uhd_tpu.cli.bench --config c4 --caps 8 --frames 32 --iters 8 --set kernel_backend=auto --jsonl $R/r3.jsonl

# 5. kernel A/B + GB/s accounting (items 4, 5)
step python bench/kernels_ab.py --iters 6 --jsonl $R/kab_r3.jsonl

# 6. per-stage profile -> roofline model cross-check (item 5)
step python bench/stages.py --jsonl $R/stages_r3.jsonl
step python bench/roofline.py --config c3 --stages-jsonl $R/stages_r3.jsonl

# 7. RDMA halo compiled-mode probe on the real chip (item 6)
step python scripts/probe_halo_tpu.py

echo "=== $(date -u +%H:%M:%S) SESSION DONE" >> $L
