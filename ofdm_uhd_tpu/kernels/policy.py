"""Per-kernel backend auto-selection (SURVEY.md §2.2-K1: "ship the XLA
path as fallback… Pallas must beat or match it to justify itself").

`spec.kernel_backend` historically plumbed ONE global string, so choosing
'pallas' switched every kernel — including the ones where the Pallas tier
measurably loses to XLA on this chip (bench/results/kab_r*.jsonl). 'auto'
resolves each kernel call to its MEASURED winner per kernel and size, so
the honest fastest bit-exact configuration can mix tiers (e.g. Pallas
interp-8x in the C4 TX path + XLA fft-256 in the C3 RX path).

The table below encodes the on-chip A/B results (TPU v5e, axon tunnel;
regenerate with `python bench/kernels_ab.py`). r3 re-measure
(bench/results/kab_r3.jsonl, 2026-08-21 — note that session's large
dispatch floor compresses all ratios toward 1):

  kernel      size    winner   ratio (pallas/xla throughput)
  fft         64      xla      0.91x r3 (was 1.06x r2 — floor noise; xla
                               kept as the conservative pick)
  fft         256     pallas   1.04x r3 (Karatsuba 3-matmul complex DFT;
                               was 0.86x with the 4-matmul form)
  fft         1024    pallas   1.02x r3 — the r2 Mosaic HTTP-500 wall is
                               GONE with the 3-matmul block shapes
  cpfft       64-256  pallas   1.04-1.11x (fused CP-strip+FFT)
  ifftcp      64      xla      1.00x (tie; xla)
  ifftcp      256     pallas   1.24x (fused IFFT+CP write)
  fir         97      xla      0.95x
  interp      8x      pallas   1.19x (1.56x r2)
  decim       8x      pallas   1.14x (1.03x r2)
  sc_corr     128     xla      0.64x
  viterbi     n=6912  xla      1.04x fused at this session's floor; at
                               large batch the scan matches it and is the
                               simpler default ('pallas' forces the fused
                               kernel, which wins the latency regime)
"""

from __future__ import annotations

# Pallas is selected iff predicate(size, n) is true; absent kernels -> xla.
# n = total samples the call processes (None when the dispatcher doesn't
# plumb it). The interp/decim length gate encodes an IN-CHAIN measurement:
# the C4 capture bench (4.15M samples/capture, 8 vmapped captures) ran
# 241 Msps with pallas decim vs 478 with xla, while the ~1M-sample kab
# microbench has pallas winning 1.14x — the Pallas tile pipeline stops
# paying past ~2M contiguous samples on this chip.
_PALLAS_WINS = {
    "fft": lambda size, n: 256 <= size <= 1024,
    "cpfft": lambda size, n: size <= 256,  # fused kernel exists for n<=512
    "ifftcp": lambda size, n: size == 256,
    "interp": lambda size, n: n is None or n <= 2 ** 21,
    "decim": lambda size, n: n is None or n <= 2 ** 21,
}


def choose(kernel: str, size: int, requested: str, n: int | None = None) -> str:
    """Resolve a backend request ('xla'|'pallas'|'auto') for one kernel call.

    size: the kernel's characteristic size (FFT length, resample factor,
    correlator half-window); n: total samples per call when known — the
    A/B winner depends on both.
    """
    if requested != "auto":
        return requested
    win = _PALLAS_WINS.get(kernel)
    return "pallas" if (win is not None and win(size, n)) else "xla"
