"""K2 v4: INTERLEAVED row-major MXU banded FIR/polyphase — MEASURED
DEAD END (r5); the production filter tier stays pallas_fir_mxu.

The idea: filter the complex buffer in its NATIVE interleaved (re, im)
layout with taps DILATED by 2 (y_int[j] = sum_t w[t] z[j + 2t]), so the
planar split/pad/merge passes disappear and MAC inflation improves to
~2.0x (vs the planar tier's 2.7x). Correct to 7e-7 vs conv_backend
(tests), but it LOSES ~30x on-chip (r5 session: fir-ilv 4.23 ms net vs
planar 0.125 at 1M samples) because this backend has no free complex
bitcast:

  * `.view(f32)` lowers as a SCATTER (inspected HLO) — ~0.5 GB/s;
  * explicit interleave (stack real/imag on a minor dim of 2 +
    reshape) is a minor-dim-2 transpose, which the TPU relayouts
    pathologically — isolated probes put the kernel itself at 0.140 ms
    (planar parity) and the whole cost in the interleave producer.

Kept as the measured A/B record (research/ convention). If a future
runtime gives complex64 a true bitcast view, this tier becomes the
planar tier minus three HBM passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels.pallas_fir_mxu import (_banded_rows_call, _round_up,  # noqa: F401
                             _two_mats)


def bitcast_ilv(x: jax.Array) -> jax.Array:
    """complex64 [..., n] -> f32 [..., 2n] interleaved.

    NOT `.view(f32)`: jnp lowers that view as a SCATTER (inspected HLO),
    which runs ~0.5 GB/s on this backend — the r5 first-cut ilv tier's
    300x pathology. Minor-dim stack + reshape is a plain relayout."""
    f = jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1)     # [..., n, 2]
    return f.reshape(*x.shape[:-1], 2 * x.shape[-1])


def bitcast_cplx(y: jax.Array) -> jax.Array:
    """f32 [..., 2n] interleaved -> complex64 [..., n]."""
    f = y.reshape(*y.shape[:-1], y.shape[-1] // 2, 2)
    return jax.lax.complex(f[..., 0], f[..., 1])


def _flatten(x):
    if x.ndim == 1:
        return x[None, :], ("1d",)
    return x.reshape(-1, x.shape[-1]), ("nd", x.shape[:-1])


def _unflatten(y, info):
    return y[0] if info[0] == "1d" else y.reshape(*info[1], y.shape[-1])


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
    from ..kernels.conv_backend import _branch_matrix
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
