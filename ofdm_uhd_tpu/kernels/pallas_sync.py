"""K3: Pallas TPU Schmidl-Cox sliding correlation.

Replaces the reference-class per-sample C++ correlator loop (SURVEY.md
§2.2-K3; mount empty, §0). The windowed sums

    P(d) = sum_{m<L} conj(r[d+m]) r[d+m+L]     (as re/im planes)
    R(d) = 0.5 * sum_{m<2L} |r[d+m]|^2

are boxcar correlations, i.e. banded matmuls with a ones band — they reuse
the block-banded MXU machinery of pallas_fir (w = ones(L)). The lag product
s[n] = conj(r[n]) r[n+L] and energy |r|^2 are cheap elementwise ops that XLA
fuses into the surrounding graph; the O(n*L) windowed-sum work runs on the
MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_fir import _banded_mats, _fir_via_banded


def _moving_sum_pallas(x: jax.Array, win: int, blk: int) -> jax.Array:
    """Valid-mode boxcar over the last axis of real [..., n] -> [..., n-win+1]."""
    shape = x.shape
    n = shape[-1]
    nd = n - win + 1
    flat = x.reshape(-1, n).astype(jnp.float32)
    w = np.ones(win, dtype=np.float32)
    _, _, h = _banded_mats((tuple(w),), blk)
    n_blocks = -(-nd // blk)
    pad_r = n_blocks * blk + h - n
    xp = jnp.pad(flat, ((0, 0), (0, max(0, pad_r))))
    y = _fir_via_banded(xp, w, blk)[:, :nd]
    return y.reshape(shape[:-1] + (nd,))


def sc_correlate_pallas(r: jax.Array, l: int, blk: int | None = None
                        ) -> tuple[jax.Array, jax.Array]:
    """r [..., n] complex -> (P [..., nd], R [..., nd]), nd = n - 2l + 1."""
    if blk is None:
        blk = max(256, ((l - 1) // 128 + 1) * 128 * 2)  # ensure 2l-1 <= blk
    prod = jnp.conj(r[..., :-l]) * r[..., l:]
    nd = r.shape[-1] - 2 * l + 1
    p_re = _moving_sum_pallas(jnp.real(prod), l, blk)[..., :nd]
    p_im = _moving_sum_pallas(jnp.imag(prod), l, blk)[..., :nd]
    e = jnp.abs(r) ** 2
    rr = 0.5 * _moving_sum_pallas(e, 2 * l, blk)
    p = (p_re + 1j * p_im).astype(jnp.complex64)
    return p, rr[..., :nd]
