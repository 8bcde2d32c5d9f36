"""K6: fused Pallas Viterbi decoder — the chain's FLOP hot spot.

The XLA path runs the 64-state ACS as a lax.scan of tiny [B,64]@[64,64]
matmuls — n trellis steps of microscopic dispatches. This kernel fuses the
WHOLE decode (forward ACS + reverse traceback) into one Pallas program per
batch tile: path metrics and decisions stay VMEM-resident, the per-step
work is two 64-wide FMAs + selects on the VPU (the permutation matmuls
degenerate to static row reorders done via precomputed one-hot matmuls on
the MXU), and nothing round-trips HBM between steps.

Matches phy.bits.viterbi_decode (and the golden decoder) bit-for-bit:
same branch metrics, same strict-'>' tie-break, same tail-terminated
traceback from state 0.

Decisions storage: [n, 64] f32 per row would be 64x the bits needed, but
VMEM is ample at our n (<= ~2300 steps: n*64*4B*TB ~ 4.7MB at TB=8) and f32
keeps every op in native VPU form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..phy import tables as T


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _viterbi_kernel(n: int, tb: int,
                    la_ref, lb_ref, sa_ref, sb_ref,
                    bits_ref, dec_ref, pm_scr):
    """One batch tile: la/lb [TB, n], outputs bits [TB, n].

    dec_ref: VMEM scratch [n, TB, 64] decisions; pm_scr: [TB, 64] metrics.
    """
    neg = jnp.float32(-1e30)
    state_iota = jax.lax.broadcasted_iota(jnp.int32, (tb, 64), 1)
    pm_scr[:] = jnp.where(state_iota == 0, 0.0, neg)

    sa = sa_ref[:]          # [2, 64] sign of output a per (pred, state)
    sb = sb_ref[:]

    def fwd(t, _):
        la_t = la_ref[:, t][:, None]                  # [TB, 1]
        lb_t = lb_ref[:, t][:, None]
        bm0 = 0.5 * (sa[0][None] * la_t + sb[0][None] * lb_t)   # [TB, 64]
        bm1 = 0.5 * (sa[1][None] * la_t + sb[1][None] * lb_t)
        pm = pm_scr[:]
        # predecessor metrics via even/odd strided halves tiled twice
        # (pred[p][s'] = ((s'<<1)|p) & 63) — exact f32 on the VPU; the MXU
        # one-hot matmul's bf16 pass corrupts large path metrics
        h0 = pm[:, 0::2]
        h1 = pm[:, 1::2]
        c0 = jnp.concatenate([h0, h0], axis=1) + bm0
        c1 = jnp.concatenate([h1, h1], axis=1) + bm1
        choice = c1 > c0
        pm_scr[:] = jnp.where(choice, c1, c0)
        dec_ref[t] = choice.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, n, fwd, 0)

    def bwd(i, state):
        t = n - 1 - i
        bit = (state >> 5) & 1                         # [TB, 1]
        oh = (state_iota == state).astype(jnp.float32)  # [TB, 64] one-hot
        d = jnp.sum(dec_ref[t] * oh, axis=1, keepdims=True)  # [TB, 1]
        bits_ref[:, t] = bit[:, 0].astype(jnp.float32)
        return ((state & 31) << 1) | d.astype(jnp.int32)

    state0 = jnp.zeros((tb, 1), dtype=jnp.int32)
    jax.lax.fori_loop(0, n, bwd, state0)


@functools.lru_cache(maxsize=16)
def _vit_consts():
    vt = T.viterbi_tables()
    sa = (1.0 - 2.0 * vt["br_a"]).astype(np.float32)
    sb = (1.0 - 2.0 * vt["br_b"]).astype(np.float32)
    return sa, sb


def viterbi_pallas(llr: jax.Array, tb: int = 8) -> jax.Array:
    """Soft-input rate-1/2 K=7 Viterbi; llr [B, 2n] -> bits [B, n] uint8."""
    sa, sb = _vit_consts()
    bsz, n2 = llr.shape
    n = n2 // 2
    # VMEM budget: the [n, TB, 64] f32 decision scratch must fit on-chip
    # (~16 MB/core). Past ~8 MB the Mosaic compile fails (observed as a
    # remote-compile crash at C3's n=6912); hand off to the windowed XLA
    # decoder, which has the same numerics and low sequential depth.
    if n * tb * 64 * 4 > 8 * 1024 * 1024:
        from ..phy.bits import viterbi_decode_windowed
        return viterbi_decode_windowed(llr)
    la = llr[:, 0::2].astype(jnp.float32)
    lb = llr[:, 1::2].astype(jnp.float32)
    pad = (-bsz) % tb
    if pad:
        z = jnp.zeros((pad, n), jnp.float32)
        la = jnp.concatenate([la, z])
        lb = jnp.concatenate([lb, z])
    bt = la.shape[0]
    vmem = pltpu.VMEM
    spec_row = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=vmem)
    out = pl.pallas_call(
        functools.partial(_viterbi_kernel, n, tb),
        grid=(bt // tb,),
        in_specs=[
            spec_row, spec_row,
            pl.BlockSpec((2, 64), lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec((2, 64), lambda i: (0, 0), memory_space=vmem),
        ],
        out_specs=spec_row,
        out_shape=jax.ShapeDtypeStruct((bt, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n, tb, 64), jnp.float32),
            pltpu.VMEM((tb, 64), jnp.float32),
        ],
        interpret=_interpret(),
    )(la, lb, jnp.asarray(sa), jnp.asarray(sb))
    return out[:bsz].astype(jnp.uint8)
