"""r5 Viterbi decode-stage variants (VERDICT r4 item 4): state-major ACS
layout and radix-4 two-step fusion.

Both transforms are bit-exact restructurings of phy.bits.viterbi_decode
(identical float ops in identical order per element; identical '>' tie
breaks), probed at the headline batch by scripts/r5_probe_vit.py:

* state-major: carry pm as [64, B] instead of [B, 64]. The per-step
  predecessor shuffle `pm[..., p::2]` is then a SUBLANE-strided extract
  (register moves on this VPU) instead of a lane-strided relayout.
* radix-4: fuse two trellis steps per scan body — two sequential ACS
  stages inside one body — halving both the forward scan and the
  traceback scan lengths (the scans' per-step overhead, not FLOPs, is
  the latency share of the decode budget).

The winning variant is routed by kernels/policy.viterbi_impl; the losers
stay here as the measured A/B record (same convention as
pallas_shift.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..phy import tables as T
from ..phy.bits import _pack_words, _traceback_word


def _signs():
    vt = T.viterbi_tables()
    sign_a0 = (1.0 - 2.0 * jnp.asarray(vt["br_a"]))[0]       # [64]
    sign_b0 = (1.0 - 2.0 * jnp.asarray(vt["br_b"]))[0]
    return sign_a0, sign_b0


def _pack_choice_smaj(choice: jax.Array) -> jax.Array:
    """[64, B] bool decisions -> [2, B] int32 words (exact: disjoint
    bits; see bits._pack_words)."""
    b = jnp.where(choice, _pack_words()[:, None], 0)          # [64, B]
    return jnp.sum(b.reshape(2, 32, *choice.shape[1:]), axis=1)


def _pred_metric_smaj(pm: jax.Array, p: int) -> jax.Array:
    """State-major twin of bits._pred_metric: sublane-strided halves."""
    h = pm[p::2]
    return jnp.concatenate([h, h], axis=0)


def viterbi_decode_smaj(llr: jax.Array, unroll: int = 8) -> jax.Array:
    """State-major [64, B] ACS; bit-exact twin of bits.viterbi_decode."""
    sign_a0, sign_b0 = _signs()
    squeeze = llr.ndim == 1
    if squeeze:
        llr = llr[None]
    bsz, n2 = llr.shape
    n = n2 // 2
    la = llr[:, 0::2].T.astype(jnp.float32)                   # [n, B]
    lb = llr[:, 1::2].T.astype(jnp.float32)

    neg = jnp.float32(-1e30)
    pm0 = jnp.concatenate(
        [jnp.zeros((1, bsz), jnp.float32),
         jnp.full((63, bsz), neg)], axis=0)                   # [64, B]

    def acs(pm, inputs):
        la_t, lb_t = inputs                                   # [B]
        bm0 = (sign_a0[:, None] * la_t[None, :]
               + sign_b0[:, None] * lb_t[None, :])            # [64, B]
        c0 = _pred_metric_smaj(pm, 0) + bm0
        c1 = _pred_metric_smaj(pm, 1) - bm0
        choice = c1 > c0
        return jnp.where(choice, c1, c0), _pack_choice_smaj(choice)

    _, packed = jax.lax.scan(acs, pm0, (la, lb),
                             unroll=unroll)                   # [n, 2, B]

    def traceback(state, dec_t):                              # dec_t [2, B]
        bit = (state >> 5) & 1
        w = jnp.where(state >= 32, dec_t[1], dec_t[0])
        d = (w >> (state & 31)) & 1
        return ((state & 31) << 1) | d, bit

    state0 = jnp.zeros(bsz, dtype=jnp.int32)
    _, bits_rev = jax.lax.scan(traceback, state0, packed, reverse=True,
                               unroll=unroll)
    bits = bits_rev.T.astype(jnp.uint8)
    return bits[0] if squeeze else bits


def viterbi_decode_radix4(llr: jax.Array, unroll: int = 4) -> jax.Array:
    """Radix-4 two-step ACS in the [B, 64] layout; bit-exact twin of
    bits.viterbi_decode (two sequential ACS stages per scan body)."""
    from ..phy.bits import _pack_choice, _pred_metric, viterbi_decode
    sign_a0, sign_b0 = _signs()
    squeeze = llr.ndim == 1
    if squeeze:
        llr = llr[None]
    bsz, n2 = llr.shape
    n = n2 // 2
    if n % 2:
        out = viterbi_decode(llr)
        return out[0] if squeeze else out
    la = llr[:, 0::2].T.astype(jnp.float32).reshape(n // 2, 2, bsz)
    lb = llr[:, 1::2].T.astype(jnp.float32).reshape(n // 2, 2, bsz)

    neg = jnp.float32(-1e30)
    onehot0 = jnp.concatenate(
        [jnp.ones((bsz, 1), jnp.float32),
         jnp.zeros((bsz, 63), jnp.float32)], axis=1)
    pm0 = neg * (1.0 - onehot0)

    def acs2(pm, inputs):
        la_t, lb_t = inputs                                   # [2, B]
        bm0 = (sign_a0[None] * la_t[0][:, None]
               + sign_b0[None] * lb_t[0][:, None])            # [B, 64]
        u0 = _pred_metric(pm, 0) + bm0
        u1 = _pred_metric(pm, 1) - bm0
        ch1 = u1 > u0
        pmm = jnp.where(ch1, u1, u0)
        bm1 = (sign_a0[None] * la_t[1][:, None]
               + sign_b0[None] * lb_t[1][:, None])
        c0 = _pred_metric(pmm, 0) + bm1
        c1 = _pred_metric(pmm, 1) - bm1
        ch2 = c1 > c0
        return (jnp.where(ch2, c1, c0),
                (_pack_choice(ch1), _pack_choice(ch2)))

    _, (p1, p2) = jax.lax.scan(acs2, pm0, (la, lb),
                               unroll=unroll)                 # [n/2, B, 2]

    def tb2(state, dec):
        d1, d2 = dec                                          # [B, 2] each
        bit_b = (state >> 5) & 1                              # step t+1
        sm = ((state & 31) << 1) | _traceback_word(state, d2)
        bit_a = (sm >> 5) & 1                                 # step t
        sq = ((sm & 31) << 1) | _traceback_word(sm, d1)
        return sq, (bit_a, bit_b)

    state0 = jnp.zeros(bsz, dtype=jnp.int32)
    _, (ba, bb) = jax.lax.scan(tb2, state0, (p1, p2), reverse=True,
                               unroll=unroll)                 # [n/2, B]
    bits = jnp.stack([ba, bb], axis=1).reshape(n, bsz).T.astype(jnp.uint8)
    return bits[0] if squeeze else bits


def viterbi_decode_smaj_radix4(llr: jax.Array, unroll: int = 4
                               ) -> jax.Array:
    """State-major + radix-4 combined; bit-exact twin of viterbi_decode."""
    from ..phy.bits import viterbi_decode
    sign_a0, sign_b0 = _signs()
    squeeze = llr.ndim == 1
    if squeeze:
        llr = llr[None]
    bsz, n2 = llr.shape
    n = n2 // 2
    if n % 2:
        out = viterbi_decode(llr)
        return out[0] if squeeze else out
    la = llr[:, 0::2].T.astype(jnp.float32).reshape(n // 2, 2, bsz)
    lb = llr[:, 1::2].T.astype(jnp.float32).reshape(n // 2, 2, bsz)

    neg = jnp.float32(-1e30)
    pm0 = jnp.concatenate(
        [jnp.zeros((1, bsz), jnp.float32),
         jnp.full((63, bsz), neg)], axis=0)                   # [64, B]

    def acs2(pm, inputs):
        la_t, lb_t = inputs                                   # [2, B]
        bm0 = (sign_a0[:, None] * la_t[0][None, :]
               + sign_b0[:, None] * lb_t[0][None, :])         # [64, B]
        u0 = _pred_metric_smaj(pm, 0) + bm0
        u1 = _pred_metric_smaj(pm, 1) - bm0
        ch1 = u1 > u0
        pmm = jnp.where(ch1, u1, u0)
        bm1 = (sign_a0[:, None] * la_t[1][None, :]
               + sign_b0[:, None] * lb_t[1][None, :])
        c0 = _pred_metric_smaj(pmm, 0) + bm1
        c1 = _pred_metric_smaj(pmm, 1) - bm1
        ch2 = c1 > c0
        return (jnp.where(ch2, c1, c0),
                (_pack_choice_smaj(ch1), _pack_choice_smaj(ch2)))

    _, (p1, p2) = jax.lax.scan(acs2, pm0, (la, lb),
                               unroll=unroll)                 # [n/2, 2, B]

    def tb2(state, dec):
        d1, d2 = dec                                          # [2, B] each
        bit_b = (state >> 5) & 1
        w2 = jnp.where(state >= 32, d2[1], d2[0])
        sm = ((state & 31) << 1) | ((w2 >> (state & 31)) & 1)
        bit_a = (sm >> 5) & 1
        w1 = jnp.where(sm >= 32, d1[1], d1[0])
        sq = ((sm & 31) << 1) | ((w1 >> (sm & 31)) & 1)
        return sq, (bit_a, bit_b)

    state0 = jnp.zeros(bsz, dtype=jnp.int32)
    _, (ba, bb) = jax.lax.scan(tb2, state0, (p1, p2), reverse=True,
                               unroll=unroll)
    bits = jnp.stack([ba, bb], axis=1).reshape(n, bsz).T.astype(jnp.uint8)
    return bits[0] if squeeze else bits
