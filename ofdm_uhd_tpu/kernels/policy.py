"""Per-kernel backend auto-selection (SURVEY.md §2.2-K1: "ship the XLA
path as fallback… Pallas must beat or match it to justify itself").

`spec.kernel_backend` historically plumbed ONE global string, so choosing
'pallas' switched every kernel — including the ones where the Pallas tier
measurably loses to XLA on this chip (bench/results/kab_r*.jsonl). 'auto'
resolves each kernel call to its MEASURED winner per kernel and size, so
the honest fastest bit-exact configuration can mix tiers (e.g. Pallas
interp-8x in the C4 TX path + XLA fft-256 in the C3 RX path).

The table encodes the on-chip A/B (TPU v5e; regenerate with
`python bench/kernels_ab.py`). AUTHORITATIVE source:
bench/results/kab_r3net.jsonl (2026-08-21), the FLOOR-FREE net timing —
reps applications inside one dispatch, slope between two traced rep
counts of the same executable. The tunnel's 50-270 ms dispatch floor made
every plain-loop ratio noise (it flipped several conclusions across
sessions); the net columns are stable and physically plausible
(GB/s <= HBM peak).

  kernel      size    net winner  pallas/xla net speedup
  fft         64      xla         0.47x (xla runs 547 GB/s = 67% of HBM
                                  SoL here — near speed-of-light already)
  fft         256     pallas      1.16x (Karatsuba 3-matmul complex DFT)
  fft         1024    xla         0.30x (compiles now — the r2 Mosaic
                                  HTTP-500 wall is gone — but loses)
  cpfft       64-256  xla         0.59-0.74x
  ifftcp      64-256  xla         0.67x
  fir         97      xla         0.11x
  interp      8x      xla         0.48x
  decim       8x      xla         0.05x (in-chain confirmation: C4 ran
                                  478 Msps xla vs 241 pallas)
  sc_corr     128     xla         0.04x
  viterbi     n=6912  PALLAS      4.92x at batch 130 (net 1.75 ms vs the
                                  scan's 8.59 ms — the fused kernel's
                                  latency-regime win, floor-masked until
                                  the net protocol; at headline batch
                                  4160 the scan amortizes and matches).
                                  'pallas' backend forces the fused
                                  kernel; 'auto' keeps the scan for the
                                  large-batch capture path.
"""

from __future__ import annotations

# Pallas is selected iff predicate(size, n) is true; absent kernels -> xla.
# n = total samples the call processes (None when the dispatcher doesn't
# plumb it).
_PALLAS_WINS = {
    "fft": lambda size, n: size == 256,
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
