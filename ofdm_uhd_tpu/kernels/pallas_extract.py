"""Frame extraction as a Pallas DMA kernel (VERDICT r4 item 1).

phy.sync.extract_frames' vmapped `dynamic_slice` gather is cheap by
itself, but its CONSUMERS (CFO ramps, the integer-CFO window FFT, the
front-end FFT) lower pathologically on this backend (probe20-23, quirk
log) — extract+CFO was the largest C3 chain stage (~26 ms of 99 ms
floor-free at batch 32). This kernel produces the frames via DMA +
on-chip shift instead, so downstream stages consume a plain Pallas
output, not a gather.

Why the r4 DMA deframer (pallas_deframe: documented dead end) failed and
this works: dynamic DMA offsets must be 128-aligned on the lane dim (and
8-aligned on the sublane dim of a row-major layout). The deframer tried
to land each frame AT its offset; here — as in pallas_localize — every
window is over-read from an ALIGNED start and the ≤1023-sample residual
is applied ON-CHIP, which is legal because the residual shift decomposes
into exactly the two operations Mosaic supports cheaply (r4 probes):

  1. lane shift by rl = t % 128 : one-hot permutation MATMUL
     C = A @ P_rl with P[k, l] = (k == (l + rl) % 128) — an MXU op;
     0/1 one-hot selection in f32 HIGHEST precision is bit-exact.
  2. sublane shift by sr = t // 128 (0..7): an 8-way select over STATIC
     sublane rolls (register moves), plus one extra static roll for the
     lane-wrap row, merged by `lane < 128 - rl`.

Layout: the capture's planes are pre-tiled (in XLA) to a row-major
[2 * nr, 128] f32 HBM array (re rows then im rows). Per frame: the DMA
reads R = Ro + 8 rows per plane from row0 = 8 * (d // 1024) (8-aligned
sublane start by construction), covering frame_len + 1024 samples; the
kernel shifts by t = d - 1024 * (d // 1024) and writes [2 * Ro, 128]
output rows. Bit-exact vs the gather: values are copied unmodified
(tests/kernels/test_extract.py, incl. clamped / past-capture offsets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


_FPB = 8          # frames per grid step (DMA overlap group)


def _extract_kernel(ro: int, r: int, ds_ref, rows_ref, out_ref,
                    *scrs_and_sem):
    """One group of _FPB frames.

    ds_ref:   scalar-prefetched [mf_pad] i32 frame offsets (clamped).
    rows_ref: [2 * nr, 128] f32 HBM row-major planes (re rows, im rows).
    out_ref:  [_FPB, 2 * ro, 128] f32 block (re rows then im rows).
    scrs:     _FPB [2 * r, 128] VMEM scratches + one DMA semaphore.
    """
    scrs = scrs_and_sem[:-1]
    sem = scrs_and_sem[-1]
    g = pl.program_id(0)
    nr = rows_ref.shape[0] // 2

    # start all 2*_FPB plane DMAs, then wait: the copies overlap
    dmas = []
    for k in range(_FPB):
        c = ds_ref[g * _FPB + k]
        row0 = (c // 1024) * 8
        dmas.append(pltpu.make_async_copy(
            rows_ref.at[pl.ds(row0, r)], scrs[k].at[pl.ds(0, r)], sem))
        dmas.append(pltpu.make_async_copy(
            rows_ref.at[pl.ds(nr + row0, r)], scrs[k].at[pl.ds(r, r)], sem))
    for d in dmas:
        d.start()
    for d in dmas:
        d.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (2 * r, 128), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)

    for k in range(_FPB):
        c = ds_ref[g * _FPB + k]
        t = c - (c // 1024) * 1024              # residual shift, 0..1023
        rl = t % 128
        sr = t // 128                           # 0..7
        # 1. lane shift by rl: one-hot permutation matmul (exact)
        p_rl = (row_i == (col_i + rl) % 128).astype(jnp.float32)
        cshift = jnp.dot(scrs[k][:], p_rl,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        # 2. sublane shift by sr: 8-way select over static rolls
        sel = cshift
        for s in range(1, 8):
            sel = jnp.where(sr == s, jnp.roll(cshift, -s, axis=0), sel)
        nxt = jnp.roll(sel, -1, axis=0)         # lane-wrap row (j + sr + 1)
        merged = jnp.where(lane < 128 - rl, sel, nxt)
        out_ref[k, :ro] = merged[:ro]           # re plane
        out_ref[k, ro:] = merged[r:r + ro]      # im plane


def extract_frames_pallas(capture: jax.Array, ds: jax.Array,
                          frame_len: int) -> jax.Array:
    """capture complex64 [n], ds i32 [mf] -> frames complex64
    [mf, frame_len]; bit-exact twin of phy.sync.extract_frames
    (dynamic_slice semantics: starts clamped into [0, n])."""
    n = capture.shape[-1]
    mf = ds.shape[0]
    ro = -(-frame_len // 128)
    r = _round_up(ro + 8, 8)
    # rows must cover reads at row0 <= 8 * (n // 1024) plus r rows
    nr = _round_up(8 * (n // 1024) + r, 8)
    npad = nr * 128
    planes = jnp.stack([jnp.real(capture), jnp.imag(capture)]
                       ).astype(jnp.float32)
    rows = jnp.pad(planes, ((0, 0), (0, npad - n))).reshape(2 * nr, 128)
    # dynamic_slice clamp semantics (extract_frames pads frame_len zeros
    # then slices: start is clamped into [0, n])
    ds_c = jnp.clip(ds.astype(jnp.int32), 0, n)
    mfp = _round_up(max(mf, _FPB), _FPB)
    ds_p = jnp.pad(ds_c, (0, mfp - mf))
    out = pl.pallas_call(
        functools.partial(_extract_kernel, ro, r),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mfp // _FPB,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((_FPB, 2 * ro, 128),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2 * r, 128), jnp.float32)
                            for _ in range(_FPB)]
                           + [pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((mfp, 2 * ro, 128), jnp.float32),
        interpret=_interpret(),
    )(ds_p, rows)
    y = out[:mf].reshape(mf, 2, ro * 128)[:, :, :frame_len]
    return (y[:, 0] + 1j * y[:, 1]).astype(jnp.complex64)
