"""Plateau localization as a Pallas DMA+VPU kernel (r4 stretch).

detect_frames' per-candidate localization — a [span]-window peak /
90%-plateau-midpoint / P-at-peak computation per candidate — runs as a
vmapped `dynamic_slice` in XLA, and gather-sliced windows lower
pathologically on this backend (~15 ms of the 23 ms batched detection
cost at the C3 headline batch; probe20-24, quirk log).

Unlike frame extraction (pallas_deframe: documented dead end), the DMA
alignment wall does NOT apply here: every candidate window can be
over-read from a 128-ALIGNED start and the statistics computed with an
offset mask — the results are positions RELATIVE to the candidate, so
the residual shift never needs to materialize.

Layout: one grid step per _CPB-candidate group; the kernel DMAs each
candidate's aligned [3, W] window (metric, Re P, Im P rows) into a
VMEM scratch row-group, then computes all group statistics vectorized
over sublanes. Lane argmax is unsupported (Mosaic) — max + masked
min-iota gives the same first-index semantics. Outputs per candidate:
d (plateau-midpoint anchor) and eps (angle(P at peak)/pi), packed into
a [mf, 128] f32 block (lanes 0/1/2: d, Re P, Im P — atan2 is not
lowerable in Mosaic, so the angle runs outside on the tiny output).

Equality vs the XLA localize is exact: same inputs, same compare/argmax
tie-breaks, f32 throughout (tests/kernels/test_localize.py; the only
divergence class is beyond-capture candidates whose windows the XLA
form clamps differently — those are invalid and masked downstream).
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


_CPB = 8          # candidates per grid step (sublane group)


def _localize_kernel(span: int, w: int, cp_half: int, rel: float,
                     cand_ref, mp3_ref, out_ref, *scrs_and_sem):
    """One group of _CPB candidates.

    cand_ref: scalar-prefetched [mf_pad] i32 candidate positions.
    mp3_ref:  [4, n_pad] HBM planes (metric, Re P, Im P, zero pad —
              DMA sublane slices must be 4-aligned on this backend).
    out_ref:  [_CPB, 128] f32 block; lanes 0=d, 1=eps.
    scrs:     _CPB separate [4, w] VMEM scratches (w = span + 256,
              128-aligned). One whole-buffer DMA per candidate: DMA
              slice shapes must be tile-aligned on this backend (4 on
              the sublane dim of a 2-D f32 ref, 8 on a 3-D middle dim),
              so a [4, 8, w] scratch sliced per candidate cannot
              compile, but whole [4, w] destinations can.
    """
    scrs = scrs_and_sem[:-1]
    sem = scrs_and_sem[-1]
    g = pl.program_id(0)

    dmas = []
    for k in range(_CPB):           # unrolled: dst chosen statically
        c = cand_ref[g * _CPB + k]
        c0 = (c // 128) * 128
        dma = pltpu.make_async_copy(
            mp3_ref.at[:, pl.ds(c0, w)], scrs[k], sem)
        dma.start()
        dma.wait()

    # gather the group's residual offsets r = c - c0 as a [CPB, 1] column
    offs = []
    for k in range(_CPB):
        c = cand_ref[g * _CPB + k]
        offs.append(c - (c // 128) * 128)
    r_col = jnp.stack(offs).reshape(_CPB, 1)          # [CPB, 1] i32

    lane = jax.lax.broadcasted_iota(jnp.int32, (_CPB, w), 1)
    in_win = (lane >= r_col) & (lane < r_col + span)
    neg = jnp.float32(-1e30)

    m_rows = jnp.concatenate([scrs[k][0:1] for k in range(_CPB)], axis=0)
    pr_rows = jnp.concatenate([scrs[k][1:2] for k in range(_CPB)], axis=0)
    pi_rows = jnp.concatenate([scrs[k][2:3] for k in range(_CPB)], axis=0)
    mw = jnp.where(in_win, m_rows, neg)

    peak = jnp.max(mw, axis=1, keepdims=True)         # [CPB, 1]
    # first-index argmax via masked min-iota (lane argmax unsupported)
    is_peak = mw >= peak
    peak_off = jnp.min(jnp.where(is_peak, lane, w), axis=1,
                       keepdims=True) - r_col         # [CPB, 1], window-rel
    ab = mw >= rel * peak
    lo = jnp.min(jnp.where(ab, lane, w), axis=1, keepdims=True) - r_col
    hi = jnp.max(jnp.where(ab, lane, -1), axis=1, keepdims=True) - r_col
    # d = c + (lo + hi)//2 - cp//2, clamped at 0
    cs = jnp.stack([cand_ref[g * _CPB + k] for k in range(_CPB)]
                   ).reshape(_CPB, 1)
    d = jnp.maximum(cs + (lo + hi) // 2 - cp_half, 0)

    pk_oh = (lane == (peak_off + r_col)).astype(jnp.float32)
    pv_re = jnp.sum(pk_oh * pr_rows, axis=1, keepdims=True)
    pv_im = jnp.sum(pk_oh * pi_rows, axis=1, keepdims=True)
    # atan2 is an unimplemented Mosaic primitive (probed r4) — emit the
    # peak P components; the [mf]-sized angle runs outside in XLA

    col = jax.lax.broadcasted_iota(jnp.int32, (_CPB, 128), 1)
    out_ref[:] = jnp.where(col == 0, d.astype(jnp.float32),
                           jnp.where(col == 1, pv_re,
                                     jnp.where(col == 2, pv_im, 0.0)))


def localize_pallas(m: jax.Array, p: jax.Array, cand: jax.Array,
                    span: int, cp: int, rel: float = 0.9
                    ) -> tuple[jax.Array, jax.Array]:
    """m [nd] f32 metric, p [nd] c64, cand [mf] i32 ->
    (d [mf] i32, eps [mf] f32); twin of the vmapped localize in
    phy.sync.detect_frames."""
    nd = m.shape[-1]
    mf = cand.shape[0]
    w = -(-(span + 128) // 128) * 128 + 128
    pad = w + 128
    mp3 = jnp.stack([
        jnp.pad(m, (0, pad)),
        jnp.pad(jnp.real(p), (0, pad)),
        jnp.pad(jnp.imag(p), (0, pad)),
        jnp.zeros(nd + pad, jnp.float32)]).astype(jnp.float32)
    mfp = -(-mf // _CPB) * _CPB
    cand_p = jnp.pad(jnp.minimum(cand.astype(jnp.int32), jnp.int32(nd)),
                     (0, mfp - mf))
    out = pl.pallas_call(
        functools.partial(_localize_kernel, span, w, cp // 2, rel),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mfp // _CPB,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((_CPB, 128), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((4, w), jnp.float32)
                            for _ in range(_CPB)]
                           + [pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((mfp, 128), jnp.float32),
        interpret=_interpret(),
    )(cand_p, mp3)
    d = out[:mf, 0].astype(jnp.int32)
    eps = (jnp.arctan2(out[:mf, 2], out[:mf, 1])
           * jnp.float32(1.0 / np.pi))
    return d, eps
