"""XLA convolution formulations for the K2 FIR/polyphase kernel.

Design notes (TPU-first, SURVEY.md §2.2-K2):
* complex-by-real filtering runs the (re, im) planes as batch through ONE
  `lax.conv_general_dilated` — XLA lowers it to MXU work for wide batches;
* polyphase interpolation never materializes the zero-stuffed signal: the
  prototype is decomposed host-side into an [L, D] branch-tap matrix and the
  L branches become conv output channels, interleaved afterwards.

Derivation for the branch matrix (matches golden.resample.resample exactly):
with u = zero-stuffed x, 'same' output y[i] = sum_j h[j]*u[i+half-j] at the
upsampled rate, write i = n*L + p:
    y[n*L + p] = sum_d g_p[d] * x[n - d],   g_p[d] = L * h[d*L + p + half]
with d in [d_min, d_max], d_min = -((half + L - 1) // L),
d_max = (len(h) - 1 - half) // L, zeros outside the prototype support.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _conv1d(x: jax.Array, kernels: jax.Array, pad_left: int, pad_right: int) -> jax.Array:
    """Batched 1-D cross-correlation: x [B, n], kernels [C, K] -> [B, C, n_out].

    out[b, c, i] = sum_t kernels[c, t] * x[b, i - pad_left + t]
    """
    lhs = x[:, None, :]                       # [B, 1, n]
    rhs = kernels[:, None, :]                 # [C, 1, K]
    return jax.lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(1,),
        padding=[(pad_left, pad_right)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )


def _split_complex(x: jax.Array) -> tuple[jax.Array, tuple]:
    """[..., n] complex -> [2*prod(batch), n] f32 planes + shape info."""
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    flat = x.reshape(-1, n)
    planes = jnp.concatenate([jnp.real(flat), jnp.imag(flat)], axis=0)
    return planes.astype(jnp.float32), (batch_shape, flat.shape[0], n)


def _merge_complex(planes: jax.Array, info, n_out: int) -> jax.Array:
    batch_shape, b, _ = info
    re, im = planes[:b], planes[b:]
    return (re + 1j * im).astype(jnp.complex64).reshape(batch_shape + (n_out,))


def fir_same(x: jax.Array, taps) -> jax.Array:
    """'Same'-aligned FIR with real taps over complex [..., n] signals.

    y[i] = sum_j taps[j] * x[i + half - j], half = (len(taps)-1)//2 —
    the f32 twin of golden.resample.fir_filter.
    """
    taps = jnp.asarray(taps, dtype=jnp.float32)
    nt = taps.shape[0]
    half = (nt - 1) // 2
    planes, info = _split_complex(x)
    k = taps[::-1][None, :]                  # correlation with flipped taps
    out = _conv1d(planes, k, pad_left=nt - 1 - half, pad_right=half)
    return _merge_complex(out[:, 0, :], info, x.shape[-1])


@functools.lru_cache(maxsize=32)
def _branch_matrix(taps_key: tuple, l: int) -> tuple[np.ndarray, int, int]:
    """Host-side polyphase branch decomposition -> (G [L, D], d_min, d_max)."""
    h = np.asarray(taps_key, dtype=np.float64) * l
    nt = len(h)
    half = (nt - 1) // 2
    d_min = -((half + l - 1) // l)
    d_max = (nt - 1 - half) // l
    dd = np.arange(d_min, d_max + 1)
    g = np.zeros((l, len(dd)), dtype=np.float32)
    for p in range(l):
        idx = dd * l + p + half
        ok = (idx >= 0) & (idx < nt)
        g[p, ok] = h[idx[ok]]
    return g, d_min, d_max


def polyphase_interp_xla(x: jax.Array, l: int, taps: np.ndarray) -> jax.Array:
    """L-fold interpolation [..., n] -> [..., n*l]; taps = prototype (numpy)."""
    g, d_min, d_max = _branch_matrix(tuple(np.asarray(taps, dtype=np.float64)), l)
    planes, info = _split_complex(x)
    # y_p[n] = sum_d g_p[d] x[n-d] = correlation with g_p reversed
    out = _conv1d(planes, jnp.asarray(g[:, ::-1]),
                  pad_left=d_max, pad_right=-d_min)        # [B2, L, n]
    n = x.shape[-1]
    inter = jnp.swapaxes(out, 1, 2).reshape(planes.shape[0], n * l)
    return _merge_complex(inter, info, n * l)


def polyphase_decim_stream(w: jax.Array, m: int, taps: np.ndarray) -> jax.Array:
    """Causal streaming M-fold decimation (valid mode, no implicit padding).

    w [..., C*m + nt - 1] = carry(nt-1 radio samples) ++ chunk; returns
    [..., C] with y[k] = sum_j h[j] * w[k*m + (nt-1) - j] — i.e. the
    continuously-filtered stream delayed by nt-1 radio samples. The constant
    delay is absorbed by frame sync. Used by the streaming receiver
    (pipeline/stream.py); GSPMD partitions the strided conv with automatic
    halo exchange when w is sharded.
    """
    taps = np.asarray(taps, dtype=np.float32)
    planes, info = _split_complex(w)
    lhs = planes[:, None, :]
    rhs = jnp.asarray(taps[::-1])[None, None, :]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(m,), padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]
    n_out = (w.shape[-1] - len(taps)) // m + 1
    return _merge_complex(out, info, n_out)


def polyphase_decim_xla(x: jax.Array, m: int, taps: np.ndarray) -> jax.Array:
    """M-fold decimation [..., n*m] -> [..., n]: strided 'same' FIR.

    Uses conv stride m so the discarded outputs are never computed.
    """
    taps = np.asarray(taps, dtype=np.float32)
    nt = len(taps)
    half = (nt - 1) // 2
    planes, info = _split_complex(x)
    lhs = planes[:, None, :]
    rhs = jnp.asarray(taps[::-1])[None, None, :]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(m,),
        padding=[(nt - 1 - half, half)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]
    return _merge_complex(out, info, x.shape[-1] // m)
