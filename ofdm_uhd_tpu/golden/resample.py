"""Golden polyphase resampler (NumPy reference).

Reference-class systems use a liquid-dsp-style C/SIMD polyphase resampler to
move between the modem rate and the radio DAC/ADC rate (SURVEY.md §2.1 #19;
mount empty, §0). This float64 implementation defines the exact numerics the
Pallas kernel (K2) must reproduce.

Prototype filter: Kaiser-windowed sinc low-pass, cutoff pi/max(L, M),
odd length => integer group delay that we slice off, so a resample by L
followed by a resample by 1/L returns a time-aligned signal.
"""

from __future__ import annotations

import numpy as np


def design_lowpass(l: int, m: int = 1, taps_per_phase: int = 12,
                   beta: float = 8.0) -> np.ndarray:
    """Kaiser-windowed sinc prototype for L/M polyphase resampling.

    Length = 2*half+1 with half = taps_per_phase*max(L,M)//2*... chosen so
    the filter is odd-length and half is a multiple of L (clean group-delay
    accounting at the upsampled rate). Gain L on interpolation compensates
    the zero insertion.
    """
    r = max(l, m)
    half = taps_per_phase * r // 2 * 2  # even, >= taps_per_phase*r - 1
    n = np.arange(-half, half + 1)
    h = np.sinc(n / r) / r
    h *= np.kaiser(len(h), beta)
    return h


def upfirdn(h: np.ndarray, x: np.ndarray, l: int, m: int) -> np.ndarray:
    """Insert l-1 zeros, filter with h, keep every m-th sample (full conv)."""
    up = np.zeros(len(x) * l, dtype=x.dtype)
    up[::l] = x
    y = np.convolve(up, h.astype(np.float64) if not np.iscomplexobj(x) else h)
    return y[::m]


def resample(x: np.ndarray, l: int, m: int,
             h: np.ndarray | None = None) -> np.ndarray:
    """Rational L/M resample, group-delay compensated.

    Output length = len(x)*l//m; output[k] ~ x(k*m/l) for bandlimited x.
    """
    if l == 1 and m == 1:
        return x.copy()
    if h is None:
        h = design_lowpass(l, m)
    half = (len(h) - 1) // 2
    up = np.zeros(len(x) * l, dtype=np.complex128)
    up[::l] = x
    y = np.convolve(up, h * l)
    y = y[half : half + len(x) * l]
    return y[::m]


def fir_filter(x: np.ndarray, h: np.ndarray) -> np.ndarray:
    """'Same'-aligned FIR (group-delay compensated), the K2 golden twin."""
    half = (len(h) - 1) // 2
    y = np.convolve(x, h)
    return y[half : half + len(x)]
