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


def sc_correlate_mxu(r: jax.Array, l: int, tr: int = 512,
                     precision=jax.lax.Precision.HIGHEST
                     ) -> tuple[jax.Array, jax.Array]:
    """r5 ROW-MAJOR MXU form (VERDICT r4 item 3b): the r2 tier above puts
    the batch on MXU rows (1-D signals -> ~6% utilization, the measured
    0.46x loser); this one reuses pallas_fir_ilv._banded_rows_call — the
    SIGNAL's block decomposition on the rows, full MXU.

    One kernel call does all three boxcars: planes (Re s, Im s, |r|^2)
    ride the row batch with ONE ones(L) band, and the 2L energy window
    folds into two shifted L-sums (movsum_2L[i] = movsum_L[i] +
    movsum_L[i+L]) — cheap XLA elementwise on the kernel output. The XLA
    doubling form materializes log2(L) full-length stages in HBM (its
    measured 9.5%-SoL wall); here everything between the 12 B/sample
    planes read and the 12 B/sample sums write stays in VMEM.
    """
    from .pallas_fir_mxu import _round_up, _two_mats
    from .pallas_fir_mxu import _banded_rows_call
    n = r.shape[-1]
    nd = n - 2 * l + 1
    lead = r.shape[:-1]
    rf = r.reshape(-1, n)
    bsz = rf.shape[0]
    prod = jnp.conj(rf[:, :-l]) * rf[:, l:]                  # [B, n-l]
    e = jnp.abs(rf) ** 2                                     # [B, n]
    # stack [3B, n]: prod planes zero-padded to n so one call serves all
    planes = jnp.concatenate([
        jnp.pad(jnp.real(prod), ((0, 0), (0, l))),
        jnp.pad(jnp.imag(prod), ((0, 0), (0, l))),
        e], axis=0)
    blk = max(128, _round_up(l, 128))
    a, b, hp = _two_mats(tuple(np.ones(l, np.float32)), blk, 1)
    sums = _banded_rows_call(planes, a, b, tr, precision)
    p_re = sums[:bsz, :nd]
    p_im = sums[bsz: 2 * bsz, :nd]
    es = sums[2 * bsz:]                                      # movsum_L of e
    rr = 0.5 * (es[:, :nd] + es[:, l: l + nd])
    p = (p_re + 1j * p_im).astype(jnp.complex64)
    return (p.reshape(lead + (nd,)), rr.reshape(lead + (nd,)))
