"""K3 v3: single-pass fused Schmidl-Cox front end (VERDICT r4 item 8).

One Pallas kernel computes, from the raw capture planes, everything the
detector's dense pass needs: the lag products, BOTH boxcar window sums,
and the normalized S&C metric — entirely VMEM-resident. The XLA form
materializes the lag product, the energy, and ~log2(L) doubling stages
in HBM (~40+ B/sample of traffic against a 12 B/sample ideal — its
measured 78 GB/s / 9.5%-SoL wall); here HBM sees only the 8 B/sample
planes read and the 12 B/sample (m, Re P, Im P) write.

The formulation that makes it cheap (requires l % 128 == 0, i.e. the
lag is q whole sublane rows — true for C3 l=128 and C4 l=512; other
geometries fall back to XLA via the dispatcher):

  * lag products / energy: elementwise against roll_up_q(plane) — a
    STATIC sublane shift (register moves).
  * length-128 moving sum is 2-ROW-LOCAL: with P the in-row inclusive
    lane prefix (7 shift-right-and-add doublings, one distinct lane
    offset each — within the Mosaic block-temp budget) and
    Q = P - x (exclusive), T = P[:, 127] broadcast:
        W128[j, l] = T[j] - Q[j, l] + Q[j+1, l]
    No cross-block carry, no long-accumulation cancellation (every sum
    spans <= 256 samples).
  * window l = q*128: W_l = sum_{k<q} roll_up_k(W128); window 2l:
    W_2l = W_l + roll_up_q(W_l) — sublane rolls, register moves.
  * metric: m = |P_lag|^2 / max(R, eps)^2 gated by R > eps, computed
    in-kernel (same formula as kernels.sync.sc_metric).

Row lookahead is bounded (2q + 2 rows), so the kernel uses the
pass-the-input-twice halo BlockSpec pattern (pallas_fir_mxu._mxu_kernel)
instead of manual DMA. Equality vs the XLA form is to f32 tolerance
(different summation order); tests/kernels/test_scfront.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _w128(x: jax.Array) -> jax.Array:
    """[R, 128] -> W[j, l] = sum of the 128 samples starting at (j, l)
    (uses row j and j+1; last row's result is garbage — callers keep
    rows whose windows stay in-bounds)."""
    p = x
    for s in (1, 2, 4, 8, 16, 32, 64):
        p = p + jnp.pad(p, ((0, 0), (s, 0)))[:, :-s]
    q = p - x                                     # exclusive prefix
    t = jnp.broadcast_to(p[:, 127:128], x.shape)  # row totals
    qn = jnp.concatenate([q[1:], jnp.zeros_like(q[:1])], axis=0)
    return t - q + qn


def _roll_up(x: jax.Array, k: int) -> jax.Array:
    """Static sublane shift: y[j] = x[j + k] (zero fill at the end)."""
    if k == 0:
        return x
    return jnp.concatenate([x[k:], jnp.zeros_like(x[:k])], axis=0)


def _scfront_kernel(q: int, eps: float,
                    re_ref, im_ref, reh_ref, imh_ref, out_ref):
    re = jnp.concatenate([re_ref[:], reh_ref[:]], axis=0)  # [TR+H, 128]
    im = jnp.concatenate([im_ref[:], imh_ref[:]], axis=0)
    re_q = _roll_up(re, q)
    im_q = _roll_up(im, q)
    pr = re * re_q + im * im_q            # Re{conj(r[i]) r[i+l]}
    pi = re * im_q - im * re_q            # Im
    e = re * re + im * im
    w_pr = _w128(pr)
    w_pi = _w128(pi)
    w_e = _w128(e)
    if q > 1:
        a_pr, a_pi, a_e = w_pr, w_pi, w_e
        for k in range(1, q):
            a_pr = a_pr + _roll_up(w_pr, k)
            a_pi = a_pi + _roll_up(w_pi, k)
            a_e = a_e + _roll_up(w_e, k)
        w_pr, w_pi, w_e = a_pr, a_pi, a_e
    rr = 0.5 * (w_e + _roll_up(w_e, q))   # window 2l energy
    epsf = jnp.float32(eps)
    m = (w_pr * w_pr + w_pi * w_pi) / jnp.maximum(rr, epsf) ** 2
    m = jnp.where(rr > epsf, m, 0.0)
    tr = out_ref.shape[1]
    out_ref[0] = m[:tr]
    out_ref[1] = w_pr[:tr]
    out_ref[2] = w_pi[:tr]


def sc_frontend_pallas(r: jax.Array, l: int, tr: int = 512,
                       eps: float = 1e-12
                       ) -> tuple[jax.Array, jax.Array]:
    """r [..., n] complex -> (P [..., nd] complex64, M [..., nd] f32),
    nd = n - 2l + 1; fused twin of sc_metric(*sc_correlate(r, l)).
    Requires l % 128 == 0."""
    assert l % 128 == 0, "fused front end needs whole-row lag"
    q = l // 128
    n = r.shape[-1]
    nd = n - 2 * l + 1
    lead = r.shape[:-1]
    rf = r.reshape(-1, n)
    bsz = rf.shape[0]
    h = _round_up(2 * q + 2, 8)
    assert tr % h == 0, "halo block must divide the main block"
    # rows per signal, padded so every window read stays in-bounds
    rr_ = -(-n // 128) + h
    rt = _round_up(rr_, tr)
    npad = rt * 128
    planes = jnp.stack([jnp.real(rf), jnp.imag(rf)]).astype(jnp.float32)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, npad - n)))
    rows = planes.reshape(2, bsz * rt, 128)
    re_rows, im_rows = rows[0], rows[1]

    grid = (bsz * rt) // tr
    vmem = pltpu.VMEM
    main = pl.BlockSpec((tr, 128), lambda i: (i, 0), memory_space=vmem)
    halo = pl.BlockSpec((h, 128), lambda i: (i * (tr // h) + tr // h, 0),
                        memory_space=vmem)
    # halo blocks for the LAST block of each signal wrap into the next
    # signal's rows — harmless: those output rows are sliced away (the
    # per-signal tail rows are zero padding >= h rows deep)
    out = pl.pallas_call(
        functools.partial(_scfront_kernel, q, eps),
        grid=grid,
        in_specs=[main, main, halo, halo],
        out_specs=pl.BlockSpec((3, tr, 128), lambda i: (0, i, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((3, bsz * rt, 128), jnp.float32),
        interpret=_interpret(),
    )(re_rows, im_rows,
      jnp.pad(re_rows, ((0, h), (0, 0))),
      jnp.pad(im_rows, ((0, h), (0, 0))))
    o = out.reshape(3, bsz, rt * 128)[:, :, :nd]
    m = o[0].reshape(lead + (nd,))
    p = (o[1] + 1j * o[2]).astype(jnp.complex64).reshape(lead + (nd,))
    return p, m
