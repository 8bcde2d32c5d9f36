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
