"""K2 v3: row-major MXU banded FIR/decimator (VERDICT r3 item 2, final).

Measured r4 dead ends this module replaces (bench/results/kab_r4*.jsonl +
scripts/tpu_probe_shift_cost.py):
  * pallas_fir (r2): banded matmuls with the BATCH on MXU rows — 1-D
    signals have 2 plane rows, so every matmul used 8/128 MXU rows (6%
    utilization) and lost 9-25x.
  * pallas_shift (r4): per-tap shifted VPU FMAs — Mosaic materializes a
    full block temp per distinct lane offset (VMEM ~ taps x block bytes,
    compile-crash beyond ~12 MB) and each tap costs ~3 VMEM passes, so
    the kernel is VMEM-bandwidth-bound at ~an XLA-matching rate no
    matter the tiling. Kept for the A/B record.

This formulation puts the SIGNAL's block decomposition on the MXU rows:
chunk the (padded) signal into rows of `blk` samples; then

    y_rows = rows @ A + rows_next @ B
    A[u, i] = w[u - i]         (0 <= u - i < W)
    B[v, i] = w[blk + v - i]   (0 <= blk + v - i < W)

where rows_next is rows shifted up by one (a one-SUBLANE roll inside the
kernel plus an 8-row halo BlockSpec — sublane shifts are register moves,
unlike lane shifts). A [TR, blk] x [blk, blk] matmul with TR=512, blk=256
uses the full MXU; MAC inflation is 2*blk/W ~ 2.7x for the 193-tap
prototype (vs 3.6-43x for the single-matmul window form), there is NO
materialized window/transpose (the XLA form's hidden HBM cost), and
everything between HBM read and HBM write stays in VMEM.

Decimation keeps the radio-rate rows ((blk*m)-sample rows -> blk outputs)
with A2 [blk*m, blk], B2 [hpad, blk]: inflation (blk*m + hpad)/W — at
blk=128, m=8 that is 6.6x, acceptable because the MXU at these shapes is
~500x the VPU alternative.

precision: HIGHEST (6-pass bf16, f32-exact products) by default to match
conv_backend bit-level gates. Mosaic rejects HIGH in-kernel
("Unsupported dot precision", r4); DEFAULT (1-pass bf16, ~0.4% relative)
measured fir 140 / decim 103 / interp 188 GB/s (probe17) and is exposed
for EVM-grade callers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_backend import _split_complex, _merge_complex


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=32)
def _two_mats(w_key: tuple, blk: int, stride: int
              ) -> tuple[np.ndarray, np.ndarray, int]:
    """Correlation weights w [W] -> (A [blk*stride, blk], B [hp, blk], hp).

    out[j*blk + i] = sum_t w[t] * xp[(j*blk + i)*stride + t]
                   = (rows[j] @ A + rows[j+1][:hp] @ B)[i]
    with rows[j] = xp[j*blk*stride : (j+1)*blk*stride].
    """
    w = np.asarray(w_key, dtype=np.float32)
    wl = len(w)
    ab = blk * stride
    assert wl - 1 <= ab, "taps longer than a row"
    hp = _round_up(max(wl - 1, 1), 128)
    assert hp <= ab, "halo wider than a row: raise blk"
    a = np.zeros((ab, blk), np.float32)
    b = np.zeros((hp, blk), np.float32)
    for i in range(blk):
        for t in range(wl):
            u = i * stride + t
            if u < ab:
                a[u, i] = w[t]
            else:
                b[u - ab, i] = w[t]
    return a, b, hp


def _mxu_kernel(precision, hp: int, x_ref, h_ref, a_ref, b_ref, y_ref):
    """y = x @ A + roll_up(x)[:, :hp] @ B (one sublane roll + 2 matmuls)."""
    x = x_ref[:]
    nxt = jnp.concatenate([x[1:, :hp], h_ref[:1, :hp]], axis=0)
    y_ref[:] = (
        jnp.dot(x, a_ref[:], precision=precision,
                preferred_element_type=jnp.float32)
        + jnp.dot(nxt, b_ref[:], precision=precision,
                  preferred_element_type=jnp.float32))


def _fir_rows_mxu(planes: jax.Array, w: np.ndarray,
                  stride: int, blk: int, tr: int, precision) -> jax.Array:
    """[B, n_in] padded-signal planes -> [B, n_out_padded] outputs.

    Rows of ab = blk*stride input samples produce blk outputs each;
    out[j*blk + i] = sum_t w[t] xp[(j*blk+i)*stride + t].
    """
    a, b, hp = _two_mats(tuple(np.asarray(w, np.float32)), blk, stride)
    ab = blk * stride
    bsz, n_in = planes.shape
    r = -(-(n_in + len(w)) // ab)            # rows per signal (+ tap slack)
    xp = jnp.pad(planes.astype(jnp.float32), ((0, 0), (0, r * ab - n_in)))
    rows = xp.reshape(bsz * r, ab)
    rt = _round_up(bsz * r, tr)
    rows = jnp.pad(rows, ((0, rt - bsz * r + 8), (0, 0)))
    vmem = pltpu.VMEM
    y = pl.pallas_call(
        functools.partial(_mxu_kernel, precision, hp),
        grid=(rt // tr,),
        in_specs=[
            pl.BlockSpec((tr, ab), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((8, ab), lambda i: (i * (tr // 8) + tr // 8, 0),
                         memory_space=vmem),
            pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((tr, blk), lambda i: (i, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((rt, blk), jnp.float32),
        interpret=_interpret(),
    )(rows, rows, jnp.asarray(a), jnp.asarray(b))
    return y[: bsz * r].reshape(bsz, r * blk)


def fir_mxu_pallas(x: jax.Array, taps, blk: int = 256, tr: int = 512,
                   precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """'Same'-aligned FIR over complex [..., n]; twin of conv_backend.fir_same."""
    taps = np.asarray(taps, dtype=np.float32)
    nt = len(taps)
    # _two_mats requires taps-1 <= blk*stride: scale the block up for long
    # filters so 'auto'/'pallas' degrade gracefully instead of asserting
    # (ADVICE r4; the MAC inflation 2*blk/W stays ~2x by construction)
    blk = max(blk, _round_up(max(nt - 1, 1), 128))
    half = (nt - 1) // 2
    w = taps[::-1]
    pad_l = nt - 1 - half
    n = x.shape[-1]
    planes, info = _split_complex(x)
    xp = jnp.pad(planes, ((0, 0), (pad_l, 0)))
    y = _fir_rows_mxu(xp, w, stride=1, blk=blk, tr=tr,
                      precision=precision)[:, :n]
    return _merge_complex(y, info, n)


def polyphase_decim_mxu_pallas(x: jax.Array, m: int, taps,
                               blk: int = 128, tr: int = 512,
                               precision=jax.lax.Precision.HIGHEST
                               ) -> jax.Array:
    """M-fold decimation [..., n*m] -> [..., n]; twin of
    conv_backend.polyphase_decim_xla: out[i] = 'same' FIR at stride m."""
    taps = np.asarray(taps, dtype=np.float32)
    nt = len(taps)
    # halo rows must fit one radio-rate row: blk*m >= round_up(taps-1, 128)
    blk = max(blk, _round_up(-(-_round_up(max(nt - 1, 1), 128) // m), 128))
    half = (nt - 1) // 2
    w = taps[::-1]
    pad_l = nt - 1 - half
    n_in = x.shape[-1]
    n_out = n_in // m
    planes, info = _split_complex(x)
    xp = jnp.pad(planes, ((0, 0), (pad_l, 0)))
    y = _fir_rows_mxu(xp, w, stride=m, blk=blk, tr=tr,
                      precision=precision)[:, :n_out]
    return _merge_complex(y, info, n_out)


def polyphase_interp_mxu_pallas(x: jax.Array, l: int, taps,
                                blk: int = 256, tr: int = 512,
                                precision=jax.lax.Precision.HIGHEST
                                ) -> jax.Array:
    """L-fold interpolation [..., n] -> [..., n*l]; twin of
    conv_backend.polyphase_interp_xla.

    Branch-major trick at the MATRIX level: output row j holds the l
    branches of input block j interleaved — A_int[u, i] = g_{i mod l}
    [.. derived ..] so the matmul emits SAMPLE-ORDER outputs directly
    (no post-transpose): out[j*blk*l + i] = y_rows[j, i] where
    out[k] = sum_d g_{k mod l}[d] * x[k//l - d].
    """
    from .conv_backend import _branch_matrix
    g, d_min, d_max = _branch_matrix(
        tuple(np.asarray(taps, dtype=np.float64)), l)     # [L, D]
    nd = g.shape[1]
    # halo rows (branch taps) must fit one input row: blk >= round_up(nd, 128)
    blk = max(blk, _round_up(max(nd, 2), 128))
    n = x.shape[-1]
    planes, info = _split_complex(x)
    xp = jnp.pad(planes, ((0, 0), (d_max, 0)))
    # out[k] = sum_d grev_{k mod l}[t] * xp[k//l + t]  (correlation form)
    grev = np.ascontiguousarray(g[:, ::-1])
    # build A/B over an output row of blk*l samples from blk(+halo) inputs
    ob = blk * l
    hp = _round_up(max(nd - 1, 1) + 1, 128)
    a = np.zeros((blk, ob), np.float32)
    b = np.zeros((hp, ob), np.float32)
    for k in range(ob):
        q, p = divmod(k, l)
        for t in range(nd):
            u = q + t
            if u < blk:
                a[u, k] = grev[p, t]
            else:
                b[u - blk, k] = grev[p, t]
    bsz, n_in = xp.shape
    r = -(-(n_in + nd) // blk)
    xpp = jnp.pad(xp.astype(jnp.float32), ((0, 0), (0, r * blk - n_in)))
    rows = xpp.reshape(bsz * r, blk)
    rt = _round_up(bsz * r, tr)
    rows = jnp.pad(rows, ((0, rt - bsz * r + 8), (0, 0)))
    vmem = pltpu.VMEM
    y = pl.pallas_call(
        functools.partial(_mxu_kernel, precision, hp),
        grid=(rt // tr,),
        in_specs=[
            pl.BlockSpec((tr, blk), lambda i: (i, 0), memory_space=vmem),
            pl.BlockSpec((8, blk), lambda i: (i * (tr // 8) + tr // 8, 0),
                         memory_space=vmem),
            pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((tr, ob), lambda i: (i, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((rt, ob), jnp.float32),
        interpret=_interpret(),
    )(rows, rows, jnp.asarray(a), jnp.asarray(b))
    y = y[: bsz * r].reshape(bsz, r * ob)[:, : n * l]
    return _merge_complex(y, info, n * l)


def _banded_rows_call(planes: jax.Array, a: np.ndarray, b: np.ndarray,
                      tr: int, precision) -> jax.Array:
    """planes [B, n_in] f32 -> [B, n_out_padded]: rows of ib = a.shape[0]
    inputs produce ob = a.shape[1] outputs each via y = rows @ A +
    roll_up(rows)[:, :hp] @ B (pallas_fir_mxu._mxu_kernel)."""
    ib, ob = a.shape
    hp = b.shape[0]
    assert hp <= ib, "halo wider than a row"
    # bound the input block to ~1 MB: tr=512 x ib=2048 f32 (4 MB) crashes
    # the axon compile helper (HTTP 500 — the deterministic VMEM wall,
    # quirk log); decimation's radio-rate rows are the wide case
    max_tr = max(128, ((1 << 20) // (4 * ib)) // 128 * 128)
    tr = min(tr, max_tr)
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
