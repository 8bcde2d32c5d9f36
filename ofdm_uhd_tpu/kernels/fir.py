"""FIR / polyphase resampler kernel (K2) — backend dispatch.

Replaces the reference-class liquid-dsp-style C/SIMD filter tier
(SURVEY.md §2.2-K2; mount empty, §0). Backends:
  'xla'    — conv_backend: one conv_general_dilated over (re, im) planes
  'pallas' — pallas_shift (r4): shifted-accumulate VPU tier (the r3
             banded-matmul pallas_fir tier lost its A/B 2-25x and is kept
             only as the bench/kernels_ab.py comparison baseline)

Numerics match golden.resample (same Kaiser-sinc prototype, same 'same'
alignment / group-delay handling), up to f32.
"""

from __future__ import annotations

import jax
import numpy as np

from . import conv_backend
from .policy import choose


def fir_filter(x: jax.Array, taps, backend: str = "xla") -> jax.Array:
    """'Same'-aligned real-taps FIR of complex signals, [..., n] -> [..., n]."""
    if choose("fir", len(taps), backend) == "pallas":
        from .pallas_shift import fir_shift_pallas
        return fir_shift_pallas(x, np.asarray(taps, dtype=np.float32))
    return conv_backend.fir_same(x, taps)


def polyphase_interp(x: jax.Array, l: int, taps: np.ndarray,
                     backend: str = "xla") -> jax.Array:
    """L-fold polyphase interpolation, [..., n] -> [..., n*l].

    taps: prototype low-pass (host numpy; gain-l compensation applied
    internally). Twin of golden.resample.resample(x, l, 1).
    """
    if choose("interp", l, backend, n=x.size) == "pallas":
        from .pallas_shift import polyphase_interp_shift_pallas
        return polyphase_interp_shift_pallas(x, l, np.asarray(taps))
    return conv_backend.polyphase_interp_xla(x, l, taps)


def polyphase_decim(x: jax.Array, m: int, taps: np.ndarray,
                    backend: str = "xla") -> jax.Array:
    """M-fold polyphase decimation, [..., n*m] -> [..., n].

    Twin of golden.resample.resample(x, 1, m).
    """
    if choose("decim", m, backend, n=x.size) == "pallas":
        from .pallas_shift import polyphase_decim_shift_pallas
        return polyphase_decim_shift_pallas(x, m, np.asarray(taps))
    return conv_backend.polyphase_decim_xla(x, m, taps)
