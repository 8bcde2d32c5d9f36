"""K2/K3 v2: shifted-accumulate VPU filter tier (VERDICT r3 item 2).

The banded-matmul formulation (pallas_fir / conv_backend) runs the
FIR/polyphase tier as dense MXU matmuls with a MAC inflation of
(blk + W - 1) / W — ~3.6x for the 193-tap prototype at blk=512 and ~43x
for the 8x decimator — plus materialized window/transpose intermediates.
The r3 floor-free A/B measured its best backend at 1.6-9.5% of the HBM
roofline (bench/results/kab_r3net.jsonl): these kernels are compute- and
intermediate-bound, not HBM-bound.

This tier re-derives the tap-level arithmetic the filters actually need —
y[i] = sum_t w[t] * x[i + t], W taps = W shifted vector FMAs — and runs it
on the VPU with every operand VMEM-resident:

  * two row layouts. CHUNK rows (fir, sc_corr): row r holds samples
    [r*C, (r+1)*C) of one signal; a block processes TR rows and builds
    its cross-row shift window from a one-sublane roll plus a SKINNY
    halo block (the next row-block's 8 x PAD head via a second BlockSpec
    into the same array — Pallas can't express overlapping blocks, but
    two index maps can). PLANE rows (decim phases, interp planes,
    long-FIR phases): rows are parallel signals tiled over columns; the
    halo is the next COLUMN tile's head.
  * FAT blocks: the first cut of these kernels tiled [64, 2048] and
    measured 25-44 us of per-grid-step overhead on this backend — 10x
    the per-step compute — so blocks are sized to ~1-4 MB (C=8192 chunk
    columns, 16-32k plane columns), putting whole 1M-sample signals in
    2-8 grid steps.
  * taps are STATIC python floats (chunk kernels) or a tiny [rows, D]
    ref sliced per tap (plane kernels) — each tap is one weighted FMA on
    a [rows, C] tile, ~2W FLOP/sample, leaving the kernels
    HBM/VPU-bound, not MXU-inflated.
  * Mosaic budget (probed r4): a kernel program crashes the remote
    compile helper past ~100 static lane-shift slice ops (25 offsets x 4
    reps OK, x 8 reps HTTP-500; 64 x 1 OK). Long filters therefore run
    PHASE-SPLIT (M=8: ceil(nt/8)+1 <= ~26 offsets), and per-phase work
    iterates in a fori_loop with dynamic SUBLANE indexing so the
    program carries one phase's FMAs only.
  * the Schmidl-Cox correlator computes lag products, energies, and BOTH
    pairwise-doubling boxcars (P: log2 L adds, R: log2 2L) inside one
    kernel — the XLA doubling form materializes every doubling stage in
    HBM, which is exactly its measured 9.5%-of-SoL wall.

Numerics: plain f32 VPU adds, doubling-tree order for the boxcars and
ascending-tap order for the FIRs; equality vs conv_backend/golden is
asserted in tests/kernels/test_shift_kernels.py and re-checked on-chip
by bench/kernels_ab.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels.conv_backend import _branch_matrix, _split_complex, _merge_complex


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Chunk-row tile: [TR, C] f32 = 1 MB blocks, 2-6 live per kernel => well
# under VMEM; a 1M-sample signal is ~8 chunk rows of 2 tiles.
_TR = 32
_C = 8192
# Mosaic's distinct-lane-shift budget per kernel program (probed r4).
_MAX_OFFSETS = 33


# ------------------------------------------------------- chunk-row helpers

def _chunk_window(x_blk, halo_blk, pad: int):
    """[TR, C] chunk-row block + [8, >=pad] next-block head -> [TR, C+pad].

    Row r's tail continuation is row r+1's head (rows are consecutive
    signal chunks); the last row borrows from the halo block.
    """
    rolled = jnp.concatenate([x_blk[1:, :pad], halo_blk[:1, :pad]], axis=0)
    return jnp.concatenate([x_blk, rolled], axis=1)


def _to_chunk_rows(planes: jax.Array, pad_l: int, w_len: int
                   ) -> tuple[jax.Array, int]:
    """[B, n] -> ([rows_padded + 8, C] chunk rows, R chunks per signal).

    Per-signal left pad pad_l; right pad to a C multiple with >= w_len
    slack so every valid output's W-tap window stays inside its own
    signal's zero padding (the roll into the next signal's row 0 then
    only feeds discarded outputs). Rows pad to a _TR multiple plus 8
    trailing zero rows so the halo BlockSpec read stays in bounds.
    """
    b, n = planes.shape
    r = -(-(pad_l + n + w_len) // _C)
    xp = jnp.pad(planes.astype(jnp.float32),
                 ((0, 0), (pad_l, r * _C - n - pad_l)))
    rows = xp.reshape(b * r, _C)
    rt = _round_up(b * r, _TR)
    rows = jnp.pad(rows, ((0, rt - b * r + 8), (0, 0)))
    return rows, r


def _chunk_specs(rows: jax.Array, pad: int):
    vmem = pltpu.VMEM
    r_tot = rows.shape[0] - 8
    spec = pl.BlockSpec((_TR, _C), lambda i: (i, 0), memory_space=vmem)
    # skinny halo: only the first `pad` lanes of the next row-block's
    # 8-row head are ever read
    spec_h = pl.BlockSpec((8, pad), lambda i: (i * (_TR // 8) + _TR // 8, 0),
                          memory_space=vmem)
    return r_tot, spec, spec_h


# ------------------------------------------------------------------- FIR

def _fir_kernel(w: tuple, pad: int, x_ref, h_ref, y_ref):
    """y[r, i] = sum_t w[t] * xw[r, i + t] — unrolled static-tap FMAs."""
    xw = _chunk_window(x_ref[:], h_ref[:], pad)
    c = y_ref.shape[1]
    acc = w[0] * xw[:, 0:c]
    for t in range(1, len(w)):
        acc = acc + w[t] * xw[:, t:t + c]
    y_ref[:] = acc


def fir_shift_pallas(x: jax.Array, taps) -> jax.Array:
    """'Same'-aligned FIR over complex [..., n]; twin of conv_backend.fir_same.

    Short filters (< _MAX_OFFSETS taps) run the chunk-row kernel; longer
    ones (the 193-tap resampler prototype) the 8-phase-split kernel (see
    module docstring on the Mosaic lane-shift budget).
    """
    taps = np.asarray(taps, dtype=np.float32)
    nt = len(taps)
    if nt - 1 >= _MAX_OFFSETS:
        return _fir_shift_phased(x, taps)
    half = (nt - 1) // 2
    w = tuple(float(v) for v in taps[::-1])      # correlation weights
    pad = _round_up(max(nt - 1, 1), 128)
    n = x.shape[-1]
    planes, info = _split_complex(x)
    rows, r = _to_chunk_rows(planes, pad_l=nt - 1 - half, w_len=nt)
    r_tot, spec, spec_h = _chunk_specs(rows, pad)
    y = pl.pallas_call(
        functools.partial(_fir_kernel, w, pad),
        grid=(r_tot // _TR,),
        in_specs=[spec, spec_h],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((r_tot, _C), jnp.float32),
        interpret=_interpret(),
    )(rows, rows)
    b = planes.shape[0]
    y = y[: b * r].reshape(b, r * _C)[:, :n]
    return _merge_complex(y, info, n)


def _fir_phase_kernel(nd: int, cp: int, x_ref, h_ref, k_ref, y_ref,
                      acc_scr):
    """Phase rows [16, CP] (2 planes x 8 phases) + next-column halo ->
    output phase rows [16, CP]: y[pl*8+q, i] = sum_p sum_e
    kern[q, p, e] * x[pl*8+p, i+e].

    The input-phase loop is a fori_loop with DYNAMIC sublane indexing
    (p scalar row reads, pl.ds coefficient rows) so the compiled program
    holds only the nd static lane-shift FMAs (Mosaic budget, module
    docstring). The phase broadcast runs over sublanes, so every FMA
    covers all 16 output rows."""
    acc_scr[:] = jnp.zeros_like(acc_scr)

    def body(p, _):
        xa = jnp.concatenate([x_ref[p, :], h_ref[p, :]])        # [CP+256]
        xb_ = jnp.concatenate([x_ref[p + 8, :], h_ref[p + 8, :]])
        w = xa.shape[0]
        xb = jnp.concatenate(
            [jnp.broadcast_to(xa[None, :], (8, w)),
             jnp.broadcast_to(xb_[None, :], (8, w))], axis=0)
        kcol = k_ref[pl.ds(p * 16, 16), :]                      # [16, ndp]
        part = kcol[:, 0:1] * xb[:, 0:cp]
        for e in range(1, nd):
            part = part + kcol[:, e:e + 1] * xb[:, e:e + cp]
        acc_scr[:] += part
        return 0

    jax.lax.fori_loop(0, 8, body, 0)
    y_ref[:] = acc_scr[:]


_CP_FIR = 4096       # plane-kernel column tile (VMEM: Mosaic
                     # materializes each slice-FMA temp, so ~nd
                     # live [rows, CP] arrays bound CP)


def _fir_shift_phased(x: jax.Array, taps: np.ndarray) -> jax.Array:
    """'Same' FIR via 8-phase decomposition: y[8i+q] = sum_{p,e}
    kern[q,p,e] * P_p[i+e] with P_p[i] = xp[8i+p] (xp left-padded)."""
    taps = np.asarray(taps, dtype=np.float32)
    nt = len(taps)
    half = (nt - 1) // 2
    k97 = taps[::-1]                 # y[j] = sum_t k97[t] * xp[j + t]
    nd = (7 + nt - 1) // 8 + 1       # e = (q + t) // 8 <= (7 + nt - 1) // 8
    assert nd < _MAX_OFFSETS
    kern = np.zeros((8, 8, nd), np.float32)       # [q, p, e]
    for q in range(8):
        for t in range(nt):
            kern[q, (q + t) % 8, (q + t) // 8] = k97[t]
    pad_l = nt - 1 - half
    n = x.shape[-1]
    planes, info = _split_complex(x)
    b = planes.shape[0]
    b2 = _round_up(b, 2)

    cp = _CP_FIR
    cols = _round_up(-(-(pad_l + n + nt) // 8) + nd, cp)
    xp = jnp.pad(planes.astype(jnp.float32),
                 ((0, b2 - b), (pad_l, cols * 8 - n - pad_l)))
    phases = xp.reshape(b2, cols, 8).transpose(0, 2, 1).reshape(b2 * 8, cols)
    phases = jnp.pad(phases, ((0, 0), (0, 256)))  # halo columns

    # kf rows: phase-p block of 16 rows = (plane q-rows for plane 0, 1)
    kf = np.zeros((8 * 16, _round_up(nd, 8)), np.float32)
    for p in range(8):
        for q in range(8):
            kf[p * 16 + q, :nd] = kern[q, p]
            kf[p * 16 + 8 + q, :nd] = kern[q, p]
    vmem = pltpu.VMEM
    y = pl.pallas_call(
        functools.partial(_fir_phase_kernel, nd, cp),
        grid=(b2 // 2, cols // cp),
        in_specs=[
            pl.BlockSpec((16, cp), lambda i, j: (i, j), memory_space=vmem),
            pl.BlockSpec((16, 256), lambda i, j: (i, (j + 1) * (cp // 256)),
                         memory_space=vmem),
            pl.BlockSpec(kf.shape, lambda i, j: (0, 0), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((16, cp), lambda i, j: (i, j),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((b2 * 8, cols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, cp), jnp.float32)],
        interpret=_interpret(),
    )(phases, phases, jnp.asarray(kf))
    # output phase rows -> sample order
    yb = y.reshape(b2, 8, cols).transpose(0, 2, 1).reshape(
        b2, cols * 8)[:b, :n]
    return _merge_complex(yb, info, n)


# --------------------------------------------------- Schmidl-Cox correlator

def _sc_kernel(l: int, pad: int, re_ref, reh_ref, im_ref, imh_ref,
               pre_ref, pim_ref, rr_ref):
    """Lag products + energies + BOTH pairwise-doubling boxcars, fused."""
    c = pre_ref.shape[1]
    rew = _chunk_window(re_ref[:], reh_ref[:], pad)    # [TR, C+pad]
    imw = _chunk_window(im_ref[:], imh_ref[:], pad)
    # prod[k] = conj(r[k]) r[k+L] for k in [0, C+L)
    a_re, a_im = rew[:, :c + l], imw[:, :c + l]
    b_re, b_im = rew[:, l:c + 2 * l], imw[:, l:c + 2 * l]
    pr = a_re * b_re + a_im * b_im                     # [TR, C+L]
    pi = a_re * b_im - a_im * b_re
    e = rew[:, :c + 2 * l] ** 2 + imw[:, :c + 2 * l] ** 2

    def boxcar(s, win, out_len):
        w = 1
        while w < win:
            s = s[:, : s.shape[1] - w] + s[:, w:]
            w *= 2
        return s[:, :out_len]

    pre_ref[:] = boxcar(pr, l, c)
    pim_ref[:] = boxcar(pi, l, c)
    rr_ref[:] = 0.5 * boxcar(e, 2 * l, c)


def sc_correlate_shift_pallas(r: jax.Array, l: int
                              ) -> tuple[jax.Array, jax.Array]:
    """r [..., n] complex -> (P [..., nd], R [..., nd]), nd = n - 2l + 1.

    Twin of kernels.sync.sc_correlate (XLA doubling form); requires l a
    power of two (the S&C case: l = n_sc/2).
    """
    assert l & (l - 1) == 0, "S&C window must be a power of two"
    shape = r.shape
    n = shape[-1]
    nd = n - 2 * l + 1
    flat = r.reshape(-1, n)
    b = flat.shape[0]
    pad = _round_up(2 * l, 128)
    re_rows, rr_ = _to_chunk_rows(jnp.real(flat), pad_l=0, w_len=2 * l)
    im_rows, _ = _to_chunk_rows(jnp.imag(flat), pad_l=0, w_len=2 * l)
    r_tot, spec, spec_h = _chunk_specs(re_rows, pad)
    outs = pl.pallas_call(
        functools.partial(_sc_kernel, l, pad),
        grid=(r_tot // _TR,),
        in_specs=[spec, spec_h, spec, spec_h],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((r_tot, _C), jnp.float32)] * 3,
        interpret=_interpret(),
    )(re_rows, re_rows, im_rows, im_rows)
    p_re, p_im, rrr = (o[: b * rr_].reshape(b, rr_ * _C)[:, :nd]
                       for o in outs)
    p = (p_re + 1j * p_im).astype(jnp.complex64)
    return (p.reshape(shape[:-1] + (nd,)),
            rrr.reshape(shape[:-1] + (nd,)).astype(jnp.float32))


# ------------------------------------------------------------- decimation

_CP_DEC = 4096       # decimated-rate column tile (see _CP_FIR)


def _decim_kernel(m: int, nd: int, pt: int, x_ref, h_ref, k_ref, y_ref):
    """Phase rows [pt*M, CP] (pt planes) + next-column halo; per-row D-tap
    FMA then sublane phase reduction:
    y[plane, i] = sum_p sum_d kern[p, d] * P[plane*M + p, i + d].
    Output block is [8, CP] with rows 0..pt-1 real (sublane-8 minimum)."""
    xw = jnp.concatenate([x_ref[:], h_ref[:]], axis=1)   # [pt*M, CP+256]
    c = y_ref.shape[1]
    acc = k_ref[:, 0:1] * xw[:, 0:c]
    for d in range(1, nd):
        acc = acc + k_ref[:, d:d + 1] * xw[:, d:d + c]
    red = jnp.sum(acc.reshape(pt, m, c), axis=1)         # [pt, CP]
    y_ref[:] = jnp.pad(red, ((0, y_ref.shape[0] - pt), (0, 0)))


def polyphase_decim_shift_pallas(x: jax.Array, m: int,
                                 taps: np.ndarray) -> jax.Array:
    """M-fold decimation [..., n*m] -> [..., n]; twin of
    conv_backend.polyphase_decim_xla (strided 'same' FIR)."""
    taps = np.asarray(taps, dtype=np.float32)
    nt = len(taps)
    half = (nt - 1) // 2
    k97 = taps[::-1]                 # out[i] = sum_t k97[t] * xp[i*m + t]
    nd = -(-nt // m)                 # taps per phase
    assert nd < _MAX_OFFSETS
    kern = np.zeros((m, nd), np.float32)
    for t in range(nt):
        kern[t % m, t // m] = k97[t]
    pad_l = nt - 1 - half
    n_in = x.shape[-1]
    n_out = n_in // m
    planes, info = _split_complex(x)
    b = planes.shape[0]
    # planes per tile: smallest pt with pt*m a sublane multiple (8)
    pt = 8 // np.gcd(8, m)
    b2 = _round_up(b, pt)
    rows_t = pt * m

    cp = _CP_DEC
    cols = _round_up(n_out + nd, cp)
    xp = jnp.pad(planes.astype(jnp.float32),
                 ((0, b2 - b), (pad_l, cols * m - n_in - pad_l)))
    phases = xp.reshape(b2, cols, m).transpose(0, 2, 1).reshape(b2 * m, cols)
    phases = jnp.pad(phases, ((0, 0), (0, 256)))     # halo columns

    kf = np.zeros((rows_t, _round_up(nd, 8)), np.float32)
    kf[:, :nd] = np.tile(kern, (pt, 1))
    vmem = pltpu.VMEM
    y = pl.pallas_call(
        functools.partial(_decim_kernel, m, nd, pt),
        grid=(b2 // pt, cols // cp),
        in_specs=[
            pl.BlockSpec((rows_t, cp), lambda i, j: (i, j),
                         memory_space=vmem),
            pl.BlockSpec((rows_t, 256), lambda i, j: (i, (j + 1) * (cp // 256)),
                         memory_space=vmem),
            pl.BlockSpec(kf.shape, lambda i, j: (0, 0), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((8, cp), lambda i, j: (i, j),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((b2 // pt * 8, cols), jnp.float32),
        interpret=_interpret(),
    )(phases, phases, jnp.asarray(kf))
    # rows 0..pt-1 of each 8-row block are that tile's planes
    y = y.reshape(b2 // pt, 8, cols)[:, :pt].reshape(b2, cols)[:b, :n_out]
    return _merge_complex(y, info, n_out)


# ----------------------------------------------------------- interpolation

_CP_INT = 4096


def _interp_kernel(l: int, nd: int, x_ref, h_ref, k_ref, y_ref):
    """Plane rows [8, CP] (+[8, 256] next-column halo) -> branch rows
    [8*L, CP]: y[p*L + q, i] = sum_d kern[q, d] * x[p, i + d]."""
    xw = jnp.concatenate([x_ref[:], h_ref[:]], axis=1)   # [8, CP+256]
    c = y_ref.shape[1]
    # sublane-broadcast each plane row to its L branch rows
    xb = jnp.concatenate(
        [jnp.broadcast_to(xw[p:p + 1], (l, xw.shape[1])) for p in range(8)],
        axis=0)                                          # [8L, CP+256]
    acc = k_ref[:, 0:1] * xb[:, 0:c]
    for d in range(1, nd):
        acc = acc + k_ref[:, d:d + 1] * xb[:, d:d + c]
    y_ref[:] = acc


def polyphase_interp_shift_pallas(x: jax.Array, l: int,
                                  taps: np.ndarray) -> jax.Array:
    """L-fold interpolation [..., n] -> [..., n*l]; twin of
    conv_backend.polyphase_interp_xla."""
    g, d_min, d_max = _branch_matrix(
        tuple(np.asarray(taps, dtype=np.float64)), l)    # [L, D]
    kern = np.ascontiguousarray(g[:, ::-1])              # out = corr(kern)
    nd = kern.shape[1]
    assert nd < _MAX_OFFSETS
    n = x.shape[-1]
    planes, info = _split_complex(x)
    b = planes.shape[0]
    p8 = _round_up(b, 8)

    cp = _CP_INT
    cols = _round_up(n + nd, cp)
    xp = jnp.pad(planes.astype(jnp.float32),
                 ((0, p8 - b), (d_max, cols - n - d_max + 256)))

    kf = np.zeros((8 * l, _round_up(nd, 8)), np.float32)
    kf[:, :nd] = np.tile(kern, (8, 1))
    vmem = pltpu.VMEM
    y = pl.pallas_call(
        functools.partial(_interp_kernel, l, nd),
        grid=(p8 // 8, cols // cp),
        in_specs=[
            pl.BlockSpec((8, cp), lambda i, j: (i, j), memory_space=vmem),
            pl.BlockSpec((8, 256), lambda i, j: (i, (j + 1) * (cp // 256)),
                         memory_space=vmem),
            pl.BlockSpec(kf.shape, lambda i, j: (0, 0), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((8 * l, cp), lambda i, j: (i, j),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((p8 * l, cols), jnp.float32),
        interpret=_interpret(),
    )(xp, xp, jnp.asarray(kf))
    # branch rows -> sample order: global row p*L + q holds output phase
    # q of plane p
    yb = y.reshape(p8, l, cols)[:b].transpose(0, 2, 1).reshape(
        b, cols * l)[:, : n * l]
    return _merge_complex(yb, info, n * l)
