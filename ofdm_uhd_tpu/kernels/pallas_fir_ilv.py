"""K2 v4: INTERLEAVED row-major MXU banded FIR/polyphase (VERDICT r4
item 3a — fuse the planar passes into the kernel).

The r4 `pallas_fir_mxu` tier wins its A/B but pays ~3 un-fused HBM round
trips beyond the kernel's own bytes: complex->planes split, pad/reshape,
planes->complex merge (the builder's own roofline accounting,
PERFORMANCE.md). This tier removes ALL of them by filtering the complex
buffer IN ITS NATIVE MEMORY LAYOUT: complex64 is interleaved (re, im)
f32 pairs, so `bitcast` to f32 doubles the length for free, and a real
FIR commutes with interleaving when its taps are DILATED by 2:

    y_int[j] = sum_t w[t] * z[j + 2t]     (both parities at once)

i.e. a 'same' FIR with tap vector w2 (w2[2t] = w[t], zeros between) —
exactly the row-major banded two-matmul of pallas_fir_mxu with a wider
band. MAC inflation actually IMPROVES: 2*blk/W with blk ~ W means ~2.0x
(the planar form ran 2*256/193 ~ 2.7x). Decimation and interpolation get
the same treatment with parity-aware band matrices (derivations in the
builders). Bitcasts are free (metadata); the kernel's HBM traffic is the
true minimum: read 8n bytes, write 8n_out bytes.

Numerics: same HIGHEST-precision (6-pass bf16, f32-exact products)
matmuls; accumulation order differs from the planar tier only in where
the structural zeros sit, so results match conv_backend to the same
2e-5-class tolerance the planar tier is tested at.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fir_mxu import _mxu_kernel, _round_up, _two_mats, _interpret


def bitcast_ilv(x: jax.Array) -> jax.Array:
    """complex64 [..., n] -> f32 [..., 2n] interleaved (bitcast view)."""
    return jnp.asarray(x).view(jnp.float32)


def bitcast_cplx(y: jax.Array) -> jax.Array:
    """f32 [..., 2n] interleaved -> complex64 [..., n]."""
    return jnp.asarray(y).view(jnp.complex64)


def _flatten(x):
    if x.ndim == 1:
        return x[None, :], ("1d",)
    return x.reshape(-1, x.shape[-1]), ("nd", x.shape[:-1])


def _unflatten(y, info):
    return y[0] if info[0] == "1d" else y.reshape(*info[1], y.shape[-1])


def _banded_rows_call(planes: jax.Array, a: np.ndarray, b: np.ndarray,
                      tr: int, precision) -> jax.Array:
    """planes [B, n_in] f32 -> [B, n_out_padded]: rows of ib = a.shape[0]
    inputs produce ob = a.shape[1] outputs each via y = rows @ A +
    roll_up(rows)[:, :hp] @ B (pallas_fir_mxu._mxu_kernel)."""
    ib, ob = a.shape
    hp = b.shape[0]
    assert hp <= ib, "halo wider than a row"
    bsz, n_in = planes.shape
    r = -(-(n_in + hp) // ib)
    xp = jnp.pad(planes.astype(jnp.float32), ((0, 0), (0, r * ib - n_in)))
    rows = xp.reshape(bsz * r, ib)
    rt = _round_up(bsz * r, tr)
    rows = jnp.pad(rows, ((0, rt - bsz * r + 8), (0, 0)))
    vmem = pltpu.VMEM
    y = pl.pallas_call(
        functools.partial(_mxu_kernel, precision, hp),
        grid=(rt // tr,),
        in_specs=[
            pl.BlockSpec((tr, ib), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((8, ib), lambda i: (i * (tr // 8) + tr // 8, 0),
                         memory_space=vmem),
            pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((tr, ob), lambda i: (i, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((rt, ob), jnp.float32),
        interpret=_interpret(),
    )(rows, rows, jnp.asarray(a), jnp.asarray(b))
    return y[: bsz * r].reshape(bsz, r * ob)


def fir_ilv_pallas(x: jax.Array, taps, blk: int | None = None,
                   tr: int = 512,
                   precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """'Same'-aligned FIR over complex [..., n]; interleaved-layout twin
    of pallas_fir_mxu.fir_mxu_pallas (no planar split/pad/merge)."""
    taps = np.asarray(taps, dtype=np.float32)
    nt = len(taps)
    half = (nt - 1) // 2
    w = taps[::-1]
    w2 = np.zeros(max(2 * nt - 1, 1), np.float32)
    w2[0::2] = w
    if blk is None:
        blk = max(256, _round_up(max(len(w2) - 1, 1), 128))
    else:
        blk = max(blk, _round_up(max(len(w2) - 1, 1), 128))
    n = x.shape[-1]
    z, info = _flatten(bitcast_ilv(x))
    zp = jnp.pad(z, ((0, 0), (2 * (nt - 1 - half), 0)))
    a, b, hp = _two_mats(tuple(w2), blk, 1)
    y = _banded_rows_call(zp, a, b, tr, precision)[:, : 2 * n]
    return bitcast_cplx(_unflatten(y, info))


@functools.lru_cache(maxsize=32)
def _decim_mats_ilv(w_key: tuple, blk: int, m: int):
    """out_int[row j, i] = sum_t w[t] zp[j*blk*m + m*i - (m-1)*(i%2) + 2t]
    (i indexes interleaved outputs; blk must be even)."""
    w = np.asarray(w_key, dtype=np.float32)
    nt = len(w)
    ib = blk * m
    max_u = m * (blk - 1) + 2 * (nt - 1)
    hp = _round_up(max(max_u - ib + 1, 1), 128)
    a = np.zeros((ib, blk), np.float32)
    b = np.zeros((hp, blk), np.float32)
    for i in range(blk):
        base = m * i - (m - 1) * (i % 2)
        for t in range(nt):
            u = base + 2 * t
            if u < ib:
                a[u, i] = w[t]
            else:
                b[u - ib, i] = w[t]
    return a, b


def polyphase_decim_ilv_pallas(x: jax.Array, m: int, taps,
                               blk: int = 256, tr: int = 512,
                               precision=jax.lax.Precision.HIGHEST
                               ) -> jax.Array:
    """M-fold decimation [..., n*m] -> [..., n], interleaved layout."""
    taps = np.asarray(taps, dtype=np.float32)
    nt = len(taps)
    half = (nt - 1) // 2
    w = taps[::-1]
    # halo must fit one radio-rate row: max_u < 2*ib (hp <= ib)
    while m * (blk - 1) + 2 * (nt - 1) + 1 > 2 * blk * m:
        blk *= 2
    n_in = x.shape[-1]
    n_out = n_in // m
    z, info = _flatten(bitcast_ilv(x))
    zp = jnp.pad(z, ((0, 0), (2 * (nt - 1 - half), 0)))
    a, b = _decim_mats_ilv(tuple(w), blk, m)
    y = _banded_rows_call(zp, a, b, tr, precision)[:, : 2 * n_out]
    return bitcast_cplx(_unflatten(y, info))


@functools.lru_cache(maxsize=32)
def _interp_mats_ilv(taps_key: tuple, blk: int, l: int):
    """Rows of ib=blk interleaved inputs -> ob=blk*l interleaved outputs:
    out_int[e] = sum_t grev[(e//2) % l][t] zp[2*((e//2)//l) + (e%2) + 2t]."""
    from .conv_backend import _branch_matrix
    g, d_min, d_max = _branch_matrix(taps_key, l)
    nd = g.shape[1]
    grev = np.ascontiguousarray(g[:, ::-1]).astype(np.float32)
    ib = blk
    ob = blk * l
    max_u = 2 * ((ob - 1) // 2 // l) + 1 + 2 * (nd - 1)
    hp = _round_up(max(max_u - ib + 1, 1), 128)
    a = np.zeros((ib, ob), np.float32)
    b = np.zeros((hp, ob), np.float32)
    for e in range(ob):
        k, c = e // 2, e % 2
        q, p = divmod(k, l)
        for t in range(nd):
            u = 2 * (q + t) + c
            if u < ib:
                a[u, e] = grev[p, t]
            else:
                b[u - ib, e] = grev[p, t]
    return a, b, d_max


def polyphase_interp_ilv_pallas(x: jax.Array, l: int, taps,
                                blk: int = 256, tr: int = 512,
                                precision=jax.lax.Precision.HIGHEST
                                ) -> jax.Array:
    """L-fold interpolation [..., n] -> [..., n*l], interleaved layout."""
    taps_key = tuple(np.asarray(taps, dtype=np.float64))
    a, b, d_max = _interp_mats_ilv(taps_key, blk, l)
    n = x.shape[-1]
    z, info = _flatten(bitcast_ilv(x))
    zp = jnp.pad(z, ((0, 0), (2 * d_max, 0)))
    y = _banded_rows_call(zp, a, b, tr, precision)[:, : 2 * n * l]
    return bitcast_cplx(_unflatten(y, info))
