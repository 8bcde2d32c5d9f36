"""ofdm_uhd_tpu — a TPU-native OFDM modem framework.

Brand-new design (NOT a port) with the capabilities of the reference
`rubiruchi/ofdm_uhd` class of C++/UHD OFDM transceivers, re-architected for
TPU: JAX/XLA for the signal chain, Pallas kernels for the hot ops (FFT,
FIR/polyphase, sync correlation), `shard_map` + collectives for pod scaling,
and file/stream sample sources in place of UHD radio I/O.

Layer map (see SURVEY.md §1.2):
  core/      specs, numerology, stream state
  golden/    float64 NumPy oracle chain (accuracy reference)
  phy/       pure-JAX PHY blocks (scramble, FEC, QAM, frame, chanest, sync, ...)
  kernels/   Pallas TPU kernels + XLA fallbacks
  channel/   impairment models (AWGN, multipath, CFO, phase noise)
  io/        capture file / stream sample sources and sinks
  pipeline/  jitted TX/RX pipelines, streaming loop
  shard/     mesh, shard_map wrappers, halo exchange, distributed init
  cli/       command-line entry points (tx, rx, loopback, bench, pod_rx)
"""

__version__ = "0.1.0"

# Exact matmul/conv numerics by default. The MXU's default precision
# rounds f32 operands to bf16, which (a) corrupted the Viterbi path
# metrics outright (scripts/tpu_probe_vitwin4.py) and (b) puts a ~-48 dB
# error floor under every one-hot selection matmul and FIR conv in the
# chain (grid scatter, depuncture, integer-CFO search, polyphase). The
# chain is latency/HBM-bound, not MXU-throughput-bound, so the 3-pass f32
# emulation costs nothing measurable. Opt out (or pick another level) via
# OFDM_MATMUL_PRECISION.
import os as _os

import jax as _jax

_jax.config.update("jax_default_matmul_precision",
                   _os.environ.get("OFDM_MATMUL_PRECISION", "highest"))
