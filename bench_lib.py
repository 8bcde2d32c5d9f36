"""Shared bench helpers: synthetic capture construction.

Used by bench.py (headline), bench/stages.py (per-stage timing) and
bench/sweeps.py so every harness measures the same waveform.
"""

from __future__ import annotations

import numpy as np


def build_capture(spec, n_frames: int, gap: int, seed: int = 0,
                  snr_db: float = 28.0, cfo: float = 0.8,
                  phase_noise_std: float = 2e-4, timing_offset: int = 100):
    """Golden-modulated multi-frame capture with channel impairments.

    Returns (capture complex64 [n], payloads uint8 [n_frames, bits]).
    """
    from ofdm_uhd_tpu.core.spec import ChannelSpec
    from ofdm_uhd_tpu.golden import GoldenModem
    from ofdm_uhd_tpu.channel import make_capture

    rng = np.random.default_rng(seed)
    gm = GoldenModem(spec)
    payloads = rng.integers(
        0, 2, (n_frames, spec.payload_bits_per_frame)).astype(np.uint8)
    frames = np.stack([gm.modulate_frame(p) for p in payloads])
    ch = ChannelSpec(snr_db=snr_db, cfo=cfo, phase_noise_std=phase_noise_std,
                     timing_offset=timing_offset)
    cap = make_capture(frames, ch, spec.n_sc, gap=gap, seed=seed)
    return cap.astype(np.complex64), payloads
