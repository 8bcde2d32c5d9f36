"""K2: Pallas TPU FIR / polyphase filter — block-banded MXU matmuls.

Replaces the reference-class liquid-dsp C/SIMD filter tier (SURVEY.md
§2.2-K2; mount empty, §0). TPU-first formulation:

A correlation y[i] = sum_t w[t] * xp[i + t] restricted to an output block of
size BLK needs input [j*BLK, j*BLK + BLK + W - 1). Rather than overlapping
BlockSpecs (not expressible) or manual DMA, split the banded operator in
two dense matmuls on the MXU:

    y_j = x_j @ A  +  head_j @ B
    A[u, i] = w[u - i]            (0 <= u - i < W)
    B[v, i] = w[BLK + v - i]      (0 <= BLK + v - i < W)

where head_j = xp[(j+1)*BLK : (j+1)*BLK + H] (H = W-1 rounded up to 128).
Multi-branch filters (polyphase interpolation) stack branches along A's
output columns, so ALL branches of the resampler run in the same two
matmuls. Complex signals travel as (re, im) planes stacked into the batch
dim (taps are real). Requires W - 1 <= BLK (true here: prototype ~97 taps).

Equality vs conv_backend/golden asserted in tests/kernels/.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_backend import _branch_matrix


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=32)
def _banded_mats(w_key: tuple, blk: int) -> tuple[np.ndarray, np.ndarray, int]:
    """w [C, W] correlation weights -> (A [blk, C*blk], B [H, C*blk], H)."""
    w = np.asarray(w_key, dtype=np.float32)
    c, wlen = w.shape
    assert wlen - 1 <= blk, "filter longer than block"
    h = _round_up(max(wlen - 1, 1), 128)
    a = np.zeros((blk, c * blk), dtype=np.float32)
    bmat = np.zeros((h, c * blk), dtype=np.float32)
    u = np.arange(blk)
    v = np.arange(h)
    for ch in range(c):
        for i in range(blk):
            t = u - i
            ok = (t >= 0) & (t < wlen)
            a[ok, ch * blk + i] = w[ch, t[ok]]
            t2 = blk + v - i
            ok2 = (t2 >= 0) & (t2 < wlen)
            bmat[ok2, ch * blk + i] = w[ch, t2[ok2]]
    return a, bmat, h


def _banded_kernel(x_ref, xh_ref, a_ref, b_ref, y_ref):
    mm = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    y_ref[:] = mm(x_ref[:], a_ref[:]) + mm(xh_ref[:], b_ref[:])


def _fir_via_banded(xp: jax.Array, w: np.ndarray, blk: int,
                    tb: int | None = None) -> jax.Array:
    """xp [B, n_blocks*blk + H] padded planes -> y [B, n_blocks*C*blk].

    Output is per-block channel-major: y[:, j*C*blk + c*blk + i].
    """
    w2 = np.atleast_2d(np.asarray(w, dtype=np.float32))
    a, bmat, h = _banded_mats(tuple(map(tuple, w2)), blk)
    bsz, n_pad = xp.shape
    n_blocks = (n_pad - h) // blk
    cblk = a.shape[1]

    if tb is None:
        tb = min(128, _round_up(bsz, 8))
    pad_b = (-bsz) % tb
    if pad_b:
        xp = jnp.concatenate([xp, jnp.zeros((pad_b, n_pad), xp.dtype)], axis=0)
    bt = xp.shape[0]

    blocks = xp[:, : n_blocks * blk]
    # head_j = xp[(j+1)*blk : (j+1)*blk + h]; build contiguously via a
    # right-extended strided reshape (no gathers)
    extra = blk - h if blk >= h else _round_up(h, blk)  # ensure reshapeable
    xp_ext = jnp.pad(xp, ((0, 0), (0, max(0, n_blocks * blk + blk - n_pad))))
    heads = (xp_ext[:, blk : blk + n_blocks * blk]
             .reshape(bt, n_blocks, blk)[:, :, :h]
             .reshape(bt, n_blocks * h))

    grid = (bt // tb, n_blocks)
    vmem = pltpu.VMEM
    out = pl.pallas_call(
        _banded_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, blk), lambda i, j: (i, j), memory_space=vmem),
            pl.BlockSpec((tb, h), lambda i, j: (i, j), memory_space=vmem),
            pl.BlockSpec((blk, cblk), lambda i, j: (0, 0), memory_space=vmem),
            pl.BlockSpec((h, cblk), lambda i, j: (0, 0), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((tb, cblk), lambda i, j: (i, j),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((bt, n_blocks * cblk), jnp.float32),
        interpret=_interpret(),
    )(blocks, heads, jnp.asarray(a), jnp.asarray(bmat))
    return out[:bsz]


def _plane_split(x: jax.Array):
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    flat = x.reshape(-1, n)
    planes = jnp.concatenate(
        [jnp.real(flat), jnp.imag(flat)], axis=0).astype(jnp.float32)
    return planes, batch_shape, flat.shape[0]


def _plane_merge(planes: jax.Array, batch_shape, b, n_out):
    re, im = planes[:b], planes[b:]
    return (re + 1j * im).astype(jnp.complex64).reshape(batch_shape + (n_out,))


def fir_pallas(x: jax.Array, taps: np.ndarray, blk: int = 512) -> jax.Array:
    """'Same'-aligned FIR, twin of conv_backend.fir_same / golden fir_filter."""
    taps = np.asarray(taps, dtype=np.float32)
    nt = len(taps)
    half = (nt - 1) // 2
    w = taps[::-1].copy()                        # correlation weights, W = nt
    n = x.shape[-1]
    planes, batch_shape, b = _plane_split(x)
    _, _, h = _banded_mats((tuple(w),), blk)
    n_blocks = -(-n // blk)
    pad_l = nt - 1 - half
    pad_r = n_blocks * blk + h - n - pad_l
    xp = jnp.pad(planes, ((0, 0), (pad_l, pad_r)))
    y = _fir_via_banded(xp, w, blk)[:, :n]
    return _plane_merge(y, batch_shape, b, n)


def polyphase_interp_pallas(x: jax.Array, l: int, taps: np.ndarray,
                            blk: int = 256) -> jax.Array:
    """L-fold interpolation; twin of conv_backend.polyphase_interp_xla.

    All L branches run in one banded matmul (C = l output channels); the
    block output [.., l, blk] is branch-major and transposed to sample
    order outside the kernel (an XLA reshape that fuses away).
    """
    g, d_min, d_max = _branch_matrix(
        tuple(np.asarray(taps, dtype=np.float64)), l)   # g [L, D]
    w = g[:, ::-1].copy()                               # w_p[t] = g_p[d_max-t]
    n = x.shape[-1]
    planes, batch_shape, b = _plane_split(x)
    _, _, h = _banded_mats(tuple(map(tuple, w.astype(np.float32))), blk)
    n_blocks = -(-n // blk)
    pad_l = d_max
    pad_r = n_blocks * blk + h - n - pad_l
    xp = jnp.pad(planes, ((0, 0), (pad_l, pad_r)))
    y = _fir_via_banded(xp, w, blk)                     # [B2, n_blocks*l*blk]
    y = y.reshape(-1, n_blocks, l, blk)
    y = jnp.swapaxes(y, 2, 3).reshape(-1, n_blocks * blk * l)[:, : n * l]
    return _plane_merge(y, batch_shape, b, n * l)


def polyphase_decim_pallas(x: jax.Array, m: int, taps: np.ndarray,
                           blk: int = 512) -> jax.Array:
    """M-fold decimation. v1: full-rate Pallas FIR + stride (the XLA path
    already avoids the wasted outputs via conv stride; a phase-split Pallas
    variant is a later optimization)."""
    y = fir_pallas(x, np.asarray(taps, dtype=np.float32), blk=blk)
    return y[..., ::m]
