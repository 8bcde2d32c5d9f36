"""JAX Schmidl-Cox synchronization: fixed-capacity frame detection under jit.

This is the hard jit problem of the chain (SURVEY.md §7.3 #1): S&C yields a
DATA-DEPENDENT number of frames at data-dependent offsets, but XLA needs
static shapes. Design: `max_frames` detection slots filled by a lax.scan
that repeatedly finds the first above-threshold metric sample after the
previous frame, localizes the plateau (90%-of-peak midpoint rule, [P:9]),
and emits (d, eps, valid). Invalid slots are masked, never branched on.

Frame extraction is a vmapped dynamic_slice; CFO correction applies the NCO
ramp per frame (SURVEY.md §2.1 #16-#17).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.spec import WaveformSpec
from ..kernels.sync import sc_correlate, sc_metric
from . import tables as T


def detect_frames(spec: WaveformSpec, capture: jax.Array, max_frames: int,
                  threshold: float = 0.5, rel: float = 0.9,
                  backend: str | None = None):
    """capture [n] -> (d [max_frames] i32, eps [max_frames] f32, valid [max_frames] bool).

    d = estimated first sample of each frame; eps = fractional CFO in
    subcarrier spacings from angle(P)/pi. Mirrors golden.sync.coarse_sync
    slot-by-slot (first-crossing + local plateau midpoint - cp/2).
    """
    l = spec.n_sc // 2
    n = capture.shape[-1]
    p, rr = sc_correlate(capture, l, backend=backend or spec.kernel_backend)
    m = sc_metric(p, rr)
    nd = m.shape[-1]
    span = spec.sym_len
    # pad so dynamic_slice windows never clamp
    m_pad = jnp.concatenate([m, jnp.zeros(span, m.dtype)])

    # Hierarchical first-crossing search (VERDICT r1 item 1a): the naive
    # slot body masked + argmax'd the FULL metric (O(nd) per slot, ~130
    # sequential full-capture passes — it dominated the chain wall-clock).
    # Precompute per-block occupancy once; each slot then searches its
    # partial start block (O(blk)) plus the block summary (O(nb)).
    # Bit-identical to the flat search: the first above-threshold index
    # >= pos is either in pos's own block or is the first occupied block
    # after it.
    blk = 512
    nb = -(-nd // blk)
    above = jnp.concatenate(
        [m >= threshold, jnp.zeros(nb * blk - nd, dtype=bool)])
    ab = above.reshape(nb, blk)
    block_any = jnp.any(ab, axis=1)                          # [nb]
    first_in_block = jnp.argmax(ab, axis=1).astype(jnp.int32)
    bidx = jnp.arange(nb, dtype=jnp.int32)
    iblk = jnp.arange(blk, dtype=jnp.int32)

    def first_crossing(pos):
        """Smallest d >= pos with m[d] >= threshold; (0, False) if none
        (matching argmax-of-empty-mask in the flat form)."""
        pb = jnp.minimum(pos // blk, nb - 1)
        off = pos - pb * blk          # >= blk when pos is past the end
        inblk = jax.lax.dynamic_slice(above, (pb * blk,), (blk,))
        inmask = (iblk >= off) & inblk
        found1 = jnp.any(inmask)
        c1 = pb * blk + jnp.argmax(inmask).astype(jnp.int32)
        later = (bidx > pb) & block_any
        found2 = jnp.any(later)
        b2 = jnp.argmax(later).astype(jnp.int32)
        fib = jax.lax.dynamic_slice(first_in_block, (b2,), (1,))[0]
        first = jnp.where(found1, c1, b2 * blk + fib)
        found = found1 | found2
        return jnp.where(found, first, 0), found

    def slot(pos, _):
        first, found = first_crossing(pos)
        w = jax.lax.dynamic_slice(m_pad, (first,), (span,))
        peak_off = jnp.argmax(w).astype(jnp.int32)
        peak_val = w[peak_off]
        above = w >= rel * peak_val
        lo = jnp.argmax(above).astype(jnp.int32)
        hi = span - 1 - jnp.argmax(above[::-1]).astype(jnp.int32)
        d = first + (lo + hi) // 2 - spec.cp // 2
        d = jnp.maximum(d, 0)
        eps = jnp.angle(p[jnp.minimum(first + peak_off, nd - 1)]) / jnp.pi
        valid = found & (d + spec.frame_len <= n)
        pos_next = jnp.where(valid, d + spec.frame_len, jnp.int32(nd))
        return pos_next, (d, eps.astype(jnp.float32), valid)

    _, (ds, epss, valids) = jax.lax.scan(slot, jnp.int32(0), None,
                                         length=max_frames)
    return ds, epss, valids


def extract_frames(spec: WaveformSpec, capture: jax.Array,
                   ds: jax.Array) -> jax.Array:
    """Gather [max_frames, frame_len] frames at offsets ds (vmapped slice)."""
    pad = jnp.zeros(spec.frame_len, capture.dtype)
    cap = jnp.concatenate([capture, pad])

    def one(d):
        return jax.lax.dynamic_slice(cap, (d,), (spec.frame_len,))

    return jax.vmap(one)(ds)


def cfo_correct(frames: jax.Array, eps: jax.Array, n_sc: int) -> jax.Array:
    """frames [B, n] * exp(-j 2 pi eps n / n_sc), per-frame eps [B]."""
    n = jnp.arange(frames.shape[-1], dtype=jnp.float32)
    phase = 2.0 * jnp.pi * eps[:, None] * n[None, :] / n_sc
    return frames * jnp.exp(-1j * phase).astype(jnp.complex64)


@functools.lru_cache(maxsize=32)
def _int_cfo_tables(spec: WaveformSpec, search: int):
    """Host-precomputed shifted-bin SELECTION MATRIX for the integer-CFO
    search (one-hot matmul instead of a [n_shifts, n_occ] gather — see
    phy/frame.py on why gathers are avoided on this backend)."""
    t = T.frame_tables(spec)
    occ = np.asarray(t["occupied_bins"], dtype=np.int64)
    shifts = np.arange(-search, search + 1)
    n_s, n_occ = len(shifts), len(occ)
    sel = np.zeros((spec.n_sc, n_s * n_occ), dtype=np.float32)
    for si, s in enumerate(shifts):
        sel[(occ + s) % spec.n_sc, si * n_occ + np.arange(n_occ)] = 1.0
    ref = np.asarray(t["sym_b_occ_conj"])                   # conj(X_B) on occ
    return sel, ref, shifts.astype(np.float32), n_s, n_occ


def integer_cfo(spec: WaveformSpec, frames: jax.Array,
                search: int = 4) -> jax.Array:
    """Integer CFO per frame [B] from preamble sym B (differential corr).

    Twin of golden.sync.integer_cfo, vectorized over frames and shifts.
    """
    sel, ref, shifts, n_s, n_occ = _int_cfo_tables(spec, search)
    start = spec.sym_len + spec.cp
    win = jax.lax.slice_in_dim(frames, start, start + spec.n_sc, axis=-1)
    y = jnp.fft.fft(win, norm="ortho").astype(jnp.complex64)   # [B, n_sc]
    selj = jnp.asarray(sel)
    ys = ((jnp.real(y) @ selj) + 1j * (jnp.imag(y) @ selj)).astype(
        jnp.complex64).reshape(y.shape[0], n_s, n_occ)
    d = ys * jnp.asarray(ref)[None, None, :]
    val = jnp.abs(jnp.sum(d[..., 1:] * jnp.conj(d[..., :-1]), axis=-1))  # [B, S]
    # gather-free shift lookup: weighted sum over the argmax one-hot
    best = jnp.argmax(val, axis=-1)                             # [B]
    oh = (jnp.arange(n_s)[None, :] == best[:, None]).astype(jnp.float32)
    return (oh @ jnp.asarray(shifts)).astype(jnp.float32)
