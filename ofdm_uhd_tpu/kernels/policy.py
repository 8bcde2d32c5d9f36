"""Per-kernel backend auto-selection (SURVEY.md §2.2-K1: "ship the XLA
path as fallback… Pallas must beat or match it to justify itself").

`spec.kernel_backend` historically plumbed ONE global string, so choosing
'pallas' switched every kernel — including the ones where the Pallas tier
measurably loses to XLA on this chip (bench/results/kab_r*.jsonl). 'auto'
resolves each kernel call to its MEASURED winner per kernel, size, and
regime, so the honest fastest bit-exact configuration can mix tiers (e.g.
Pallas fft-256 in the C3 RX path + XLA interp-8x in the C4 TX path, and
the fused Pallas Viterbi in the latency regime while large-batch captures
keep the scan decoder).

The table encodes the on-chip A/B (TPU v5e; regenerate with
`python bench/kernels_ab.py`). AUTHORITATIVE source: the newest
bench/results/kab_r*net.jsonl — the FLOOR-FREE net timing (reps
applications inside one dispatch, slope between two traced rep counts of
the same executable). The tunnel's 50-270 ms dispatch floor made every
plain-loop ratio noise (it flipped several conclusions across sessions);
the net columns are stable and physically plausible (GB/s <= HBM peak).
tests/kernels/test_policy_matches_bench.py re-derives every winner from
the committed jsonl and FAILS if this table drifts from the measurement.

  kernel      size    net winner  pallas/xla net speedup (kab_r3net)
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
  viterbi     n=6912  regime-dependent: the fused Pallas kernel wins the
                      LATENCY regime — 3.71x at batch 130 (kab_r4net:
                      net 1.75 ms vs the scan's 6.48) — because its
                      wall-clock is the sequential trellis, amortized
                      across at most a few hundred lanes; at large batch
                      the scan's per-step cost amortizes over the batch
                      and overtakes it (scan wins 1.3x at 1040, 2.4x at
                      4160). 'auto' routes batch <=
                      _VITERBI_PALLAS_MAX_BATCH (streaming steps decode
                      ~18 slots/shard; single captures ~130 frames) to
                      the fused kernel and keeps the scan for
                      headline-batch captures.
"""

from __future__ import annotations

# Measured crossover bound for the fused Pallas Viterbi (bit-exact either
# way; this is purely a speed decision). kab_r4net batch sweep: fused
# wins 3.71x at batch 130 (net 1.75 vs 6.48 ms), loses at 1040 (13.4 vs
# 10.2) and 4160 (57.0 vs 23.4) — the linear cost models cross at
# ~670 frames; 512 keeps a safety margin on the fused side.
_VITERBI_PALLAS_MAX_BATCH = 512

# Pallas is selected iff predicate(size, n) is true; absent kernels -> xla.
# size = the kernel's characteristic size (FFT length, resample factor,
# trellis length); n = batch/sample count for regime-dependent kernels
# (None when the dispatcher doesn't plumb it -> conservative xla).
_PALLAS_WINS = {
    "fft": lambda size, n: size == 256,
    "viterbi": lambda size, n: (n is not None
                                and n <= _VITERBI_PALLAS_MAX_BATCH),
}


def choose(kernel: str, size: int, requested: str, n: int | None = None) -> str:
    """Resolve a backend request ('xla'|'pallas'|'auto') for one kernel call.

    size: the kernel's characteristic size (FFT length, resample factor,
    correlator half-window, Viterbi trellis length); n: batch or total
    samples per call when known — the A/B winner depends on both.
    """
    if requested != "auto":
        return requested
    win = _PALLAS_WINS.get(kernel)
    return "pallas" if (win is not None and win(size, n)) else "xla"
