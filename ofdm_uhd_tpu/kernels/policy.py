"""Per-kernel backend auto-selection (SURVEY.md §2.2-K1: "ship the XLA
path as fallback… Pallas must beat or match it to justify itself").

`spec.kernel_backend` historically plumbed ONE global string, so choosing
'pallas' switched every kernel — including the ones where the Pallas tier
measurably loses to XLA on this chip (bench/results/kab_r*.jsonl). 'auto'
resolves each kernel call to its MEASURED winner per kernel, size, and
regime, so the honest fastest bit-exact configuration can mix tiers (e.g.
Pallas fft-256 + MXU-banded fir/interp next to XLA decim/sc_corr, and a
three-way Viterbi algorithm choice by batch regime).

The table encodes the on-chip A/B (TPU v5e; regenerate with
`python bench/kernels_ab.py`). AUTHORITATIVE source: the newest
bench/results/kab_r*net.jsonl — the FLOOR-FREE net timing (reps
applications inside one dispatch, slope between two traced rep counts of
the same executable). The tunnel's 50-270 ms dispatch floor made every
plain-loop ratio noise (it flipped several conclusions across sessions);
the net columns are stable and physically plausible (GB/s <= HBM peak).
tests/kernels/test_policy_matches_bench.py re-derives every winner from
the committed jsonl and FAILS if this table drifts from the measurement.

  kernel      size    net winner  pallas/xla net speedup (kab_r4net)
  fft         64      xla         0.51x (xla runs 511 GB/s = 62% of HBM
                                  SoL here — near speed-of-light already)
  fft         256     pallas      1.20x (Karatsuba 3-matmul complex DFT;
                                  stable across r3/r4 sessions)
  fft         1024    xla         0.29x
  cpfft       64-256  xla         0.57-0.74x
  ifftcp      64-256  xla         0.66-0.74x
  fir         193t    PALLAS      1.14x (pallas_fir_mxu row-major banded
                                  two-matmul, 95.6 GB/s vs xla auto-blk
                                  84.0; the r2/r4 pallas tiers lost —
                                  see pallas_fir_mxu docstring)
  interp      8x      PALLAS      6.2x (84.9 GB/s vs 13.8 — the XLA
                                  branch-matrix form pays a window +
                                  branch transpose it cannot fuse)
  decim       8x      xla         0.97x tie (93.2 vs 90.1 GB/s; xla
                                  auto-blk=128 closed the r3 gap, tie ->
                                  fallback doctrine keeps xla)
  sc_corr     128     xla         0.46x (doubling form at 78 GB/s)
  viterbi     n=6912  regime-dependent, and an ALGORITHM choice as much
                      as a backend one (viterbi_impl): the fused Pallas
                      kernel wins only the deep-latency regime (batch
                      <= ~96: streaming steps decode ~18 slots/shard);
                      the windowed-parallel XLA decoder wins the middle
                      (1.43/5.52 ms at batch 130/1040 vs scan 6.48/
                      10.25); the full scan retakes the headline batch
                      (23.4 vs 26.7 ms at 4160). All bit-exact on
                      decodable frames; kab_r4net viterbi* rows.
"""

from __future__ import annotations

# Viterbi decoder-ALGORITHM crossovers (kab_r4net batch sweep at n=6912,
# all three bit-exact on every decodable frame; net ms):
#     batch   scan   windowed   fused-pallas
#     130     6.48   1.43       1.75
#     1040    10.25  5.52       13.4
#     4160    23.40  26.7       57.0
# Linear cost models: fused ~0.08 + 12.8us*B beats windowed ~0.85 +
# 4.5us*B below B~93 (the streaming ~18-slot regime); windowed beats the
# scan up to B~2600 (the scan's lower HBM slope takes over at headline
# batch). Bounds sit inside the measured brackets with margin.
_VITERBI_FUSED_MAX_BATCH = 96
_VITERBI_WINDOWED_MAX_BATCH = 2048


def viterbi_impl(size: int, batch: int | None, requested: str = "auto",
                 mode: str = "scan") -> str:
    """Pick the Viterbi decoder implementation: 'fused' (Pallas
    whole-decode kernel), 'windowed' (XLA windowed-parallel scan), or
    'scan' (XLA full-sequence scan).

    All three emit identical bits on every decodable frame; the windowed
    forms can differ from the full scan only on CRC-failing garbage
    (survivor non-merge — phy.bits.viterbi_decode_windowed docstring),
    which the chain's CRC gate already discards, so 'auto' is free to
    route on speed alone. requested='pallas' forces the fused kernel;
    'xla' respects the spec's viterbi_mode; 'auto' uses the measured
    batch crossovers above (unknown batch -> scan, the conservative
    large-batch winner).
    """
    if requested == "pallas":
        return "fused"
    if requested != "auto":
        return "windowed" if mode == "windowed" else "scan"
    if batch is None:
        return "scan"
    if batch <= _VITERBI_FUSED_MAX_BATCH:
        return "fused"
    if batch <= _VITERBI_WINDOWED_MAX_BATCH:
        return "windowed"
    return "scan"


# Pallas is selected iff predicate(size, n) is true; absent kernels -> xla.
# size = the kernel's characteristic size (FFT length, resample factor,
# trellis length); n = batch/sample count for regime-dependent kernels
# (None when the dispatcher doesn't plumb it -> conservative xla).
_PALLAS_WINS = {
    "fft": lambda size, n: size == 256,
    # fir: the MXU banded tier wins at the 193-tap prototype (and any
    # long filter — the win comes from killing the window/transpose
    # materializations, which grow with taps); short smoothing kernels
    # are unmeasured -> xla.
    "fir": lambda size, n: size >= 64,
    "interp": lambda size, n: True,
    "viterbi": lambda size, n: viterbi_impl(size, n) == "fused",
    # frame extraction: the Pallas DMA kernel (aligned over-read + on-chip
    # residual shift) measured 3x the gather form AND de-pathologizes its
    # consumers (r5_probe_extract: det+ext+CFO 32.9 -> 19.3 ms, through
    # the front end 43.0 -> 26.9 ms at the C3 headline batch 32).
    "extract": lambda size, n: True,
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
