"""Per-kernel backend auto-selection (SURVEY.md §2.2-K1: "ship the XLA
path as fallback… Pallas must beat or match it to justify itself").

`spec.kernel_backend` historically plumbed ONE global string, so choosing
'pallas' switched every kernel — including the ones where the Pallas tier
measurably loses to XLA on this chip (bench/results/kab_r*.jsonl). 'auto'
resolves each kernel call to its MEASURED winner per kernel and size, so
the honest fastest bit-exact configuration can mix tiers (e.g. Pallas
interp-8x in the C4 TX path + XLA fft-256 in the C3 RX path).

The table below encodes the on-chip A/B results (TPU v5e, axon tunnel;
regenerate with `python bench/kernels_ab.py`):

  kernel      size    winner   ratio (pallas/xla throughput)
  fft         64      pallas   1.06x
  fft         256     xla      0.86x
  fft         1024    xla      (Pallas impossible: Mosaic HTTP-500 on
                               every [*, 1024]-wide block — PERFORMANCE.md)
  fir         97      xla      0.97x
  interp      8x      pallas   1.56x
  decim       8x      pallas   1.03x
  sc_corr     128     xla      0.82x
  viterbi     n=6912  xla      0.97x at large batch (scan amortizes; the
                               fused kernel wins the latency regime and is
                               used by kernel_backend='pallas')
"""

from __future__ import annotations

# Pallas is selected iff predicate(size) is true; absent kernels -> xla.
_PALLAS_WINS = {
    "fft": lambda n: n <= 64,
    "interp": lambda l: True,
    "decim": lambda m: True,
}


def choose(kernel: str, size: int, requested: str) -> str:
    """Resolve a backend request ('xla'|'pallas'|'auto') for one kernel call.

    size: the kernel's characteristic size (FFT length, resample factor,
    correlator half-window) — the A/B winner is size-dependent.
    """
    if requested != "auto":
        return requested
    win = _PALLAS_WINS.get(kernel)
    return "pallas" if (win is not None and win(size)) else "xla"
