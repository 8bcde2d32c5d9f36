"""Golden Schmidl-Cox timing/CFO synchronization (NumPy reference).

Reference-class system runs this as the hot per-sample C++ loop in the RX
thread (SURVEY.md §3.1; mount empty, §0). Algorithm per Schmidl & Cox /
[P:6,P:9]:

    P(d) = sum_{m=0}^{L-1} conj(r[d+m]) * r[d+m+L]        (L = n_sc/2)
    R(d) = 0.5 * sum_{m=0}^{2L-1} |r[d+m]|^2
    M(d) = |P(d)|^2 / R(d)^2

R uses the symmetric full-window energy (Minn's variant) rather than the
original second-half-only energy: the asymmetric form false-triggers at
signal->silence edges (trailing frame boundary into an idle gap), where the
second-half energy collapses and |P|^2/R^2 spikes above the true plateau.

M plateaus over the CP of the first preamble symbol; the 90%-of-max plateau
midpoint gives CP-window timing accuracy. Fractional CFO (in subcarrier
spacings) = angle(P)/pi. Integer CFO from correlating the received sym-B
spectrum against the known PN at integer bin shifts.
"""

from __future__ import annotations

import numpy as np

from ..core.spec import WaveformSpec
from .modem import preamble_freq


def sc_metric(spec: WaveformSpec, r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Return (P(d), R(d)) for d = 0 .. len(r)-2L, via cumulative sums.

    O(n) sliding-window form of the reference's recursive per-sample update
    P(d+1) = P(d) + (...) (SURVEY.md §2.1 #16).
    """
    L = spec.n_sc // 2
    n = len(r)
    nd = n - 2 * L + 1
    if nd <= 0:
        return np.zeros(0, complex), np.zeros(0)
    prod = np.conj(r[:-L]) * r[L:]               # [n-L]
    e = np.abs(r) ** 2
    cp = np.concatenate([[0], np.cumsum(prod)])
    ce = np.concatenate([[0], np.cumsum(e)])
    p = cp[L : L + nd] - cp[:nd]
    rr = 0.5 * (ce[2 * L : 2 * L + nd] - ce[:nd])   # full-window energy / 2
    return p, rr


def detect_plateau(m: np.ndarray, threshold: float = 0.5,
                   rel: float = 0.9, span: int | None = None) -> int:
    """Timing from the S&C metric: midpoint of the region above `rel` x peak
    around the FIRST threshold crossing (searching a local `span` after it,
    so a later frame in the same window cannot steal the argmax). Returns -1
    if no detection."""
    if len(m) == 0:
        return -1
    above = np.nonzero(m >= threshold)[0]
    if len(above) == 0:
        return -1
    i0 = int(above[0])
    end = len(m) if span is None else min(i0 + span, len(m))
    peak = i0 + int(np.argmax(m[i0:end]))
    lvl = rel * m[peak]
    lo = peak
    while lo > 0 and m[lo - 1] >= lvl:
        lo -= 1
    hi = peak
    while hi < len(m) - 1 and m[hi + 1] >= lvl:
        hi += 1
    return (lo + hi) // 2


def coarse_sync(spec: WaveformSpec, r: np.ndarray,
                threshold: float = 0.5) -> tuple[int, float]:
    """Detect one frame: returns (d_hat, eps_frac).

    d_hat is the estimated index of the first sample of the frame (start of
    the sym-A cyclic prefix); -1 if nothing detected. The S&C plateau spans
    the CP, so its midpoint sits ~cp/2 before the symbol window; we calibrate
    the midpoint back to the frame start (validated in tests/property).
    eps_frac is the fractional CFO in subcarrier spacings, range (-1, 1].
    """
    p, rr = sc_metric(spec, r)
    m = np.where(rr > 1e-12, np.abs(p) ** 2 / np.maximum(rr, 1e-12) ** 2, 0.0)
    d = detect_plateau(m, threshold, span=spec.sym_len)
    if d < 0:
        return -1, 0.0
    # plateau spans d in [frame_start - ~cp/2 .. frame_start + ~cp/2] is not
    # symmetric: M(d) is flat for d in [start, start+cp] (all-CP windows);
    # midpoint ~ start + cp/2. Back off to the plateau's left edge.
    d_hat = d - spec.cp // 2
    eps = float(np.angle(p[d])) / np.pi
    return d_hat, eps


def integer_cfo(spec: WaveformSpec, r_frame: np.ndarray,
                search: int = 4) -> int:
    """Integer CFO (subcarrier units) from preamble sym B.

    After fractional correction, FFT the sym-B window and correlate its
    magnitude-weighted product with the known PN at shifts in [-search,
    search]; the true shift maximizes coherence. Differential (adjacent-bin)
    correlation removes the unknown channel phase.
    """
    _, sym_b = preamble_freq(spec)
    start = spec.sym_len + spec.cp  # sym B window within the frame
    win = r_frame[start : start + spec.n_sc]
    y = np.fft.fft(win, norm="ortho")
    occ = spec.occupied_bins
    # differential correlation: channel varies slowly across adjacent bins
    ref = sym_b[occ]
    best, best_val = 0, -np.inf
    for s in range(-search, search + 1):
        ys = y[(occ + s) % spec.n_sc]
        d = ys * np.conj(ref)
        val = np.abs(np.sum(d[1:] * np.conj(d[:-1])))
        if val > best_val:
            best, best_val = s, val
    return best


def cfo_correct(r: np.ndarray, eps: float, n_sc: int,
                phase0: float = 0.0) -> np.ndarray:
    """Mix by exp(-j*(2*pi*eps*n/n_sc + phase0)) (SURVEY.md §2.1 #17)."""
    n = np.arange(len(r))
    return r * np.exp(-1j * (2.0 * np.pi * eps * n / n_sc + phase0))
