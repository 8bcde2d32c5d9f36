"""K6: fused Pallas Viterbi decoder — the chain's sequential hot spot.

The XLA path runs the 64-state ACS as a lax.scan of tiny steps; through
this environment's backend each scan iteration costs ~19-70 us of fixed
overhead, so trellis wall-clock is pure loop latency. This kernel fuses
the WHOLE decode (forward ACS + reverse traceback) into one Pallas program
per tile: path metrics and decisions stay VMEM-resident and the per-step
work is two one-hot MXU matmuls + VPU selects, with no per-step dispatch.

One kernel covers both shapes of the problem:
  * whole-sequence decode = a single window with first=tail=1 (exact
    state-0 boundary conditions at both ends);
  * windowed-parallel decode (flagship sizes, e.g. C3 n=6912) = sliding
    windows with per-window first/tail flags, the same overlap semantics
    as phy.bits.viterbi_decode_windowed.

Mosaic lowering rules this backend enforces (probed on-chip 2026-08-20):
  * NO dynamic indexing of the lane (last) dim of a ref — time must be the
    SUBLANE-major dim, so la/lb/bits travel as [E, rows] and decisions as
    [E, sub, 64] indexed on dim 0;
  * NO strided lane slices (pm[:, 0::2] is an unsupported gather) — the
    predecessor shuffle pred[p][s'] = ((s'<<1)|p) & 63 is a ONE-HOT MATMUL
    at precision=HIGHEST (exact: each output is a single f32 product; the
    default bf16 pass would truncate path metrics);
  * NO lane-dim argmax (Mosaic internal error) — best-final-state search
    is max + masked min-iota (same first-index tie-break as jnp.argmax);
  * block lane dims must be divisible by 128 — row tiles are 128 wide, and
    the kernel loops over SUB-BATCHES of `sub` rows so the [E, sub, 64]
    decision scratch stays inside VMEM.

Matches phy.bits.viterbi_decode / viterbi_decode_windowed (and the golden
decoder) bit-for-bit on every decodable input: same branch metrics, same
strict-'>' tie-break, same boundary conditions. (The default Pallas window
geometry 256/64 differs from the XLA 512/96 — outputs can differ only on
undecodable garbage where survivor paths fail to merge; CRC gates those.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..phy import tables as T

_TR = 128          # row tile (block lane dim; must be 128-divisible)
_SUB = 32          # rows processed per decision-scratch pass
_BIG = jnp.float32(2048.0)   # LLR certainty for bit-0 padding steps


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_MM = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)


@functools.lru_cache(maxsize=4)
def _perm_mats() -> tuple[np.ndarray, np.ndarray]:
    """P_p[s, s'] = 1 iff s = ((s'<<1)|p) & 63, so (pm @ P_p)[s'] is the
    predecessor metric pm[pred[p][s']]."""
    mats = []
    for p in (0, 1):
        m = np.zeros((64, 64), np.float32)
        for sp in range(64):
            m[((sp << 1) | p) & 63, sp] = 1.0
        mats.append(m)
    return mats[0], mats[1]


@functools.lru_cache(maxsize=16)
def _vit_consts():
    vt = T.viterbi_tables()
    sa = (1.0 - 2.0 * vt["br_a"]).astype(np.float32)
    sb = (1.0 - 2.0 * vt["br_b"]).astype(np.float32)
    return sa, sb


def _vit_kernel(e: int, la_ref, lb_ref, first_ref, tail_ref,
                sa_ref, sb_ref, p0_ref, p1_ref,
                bits_ref, dec_ref, pm_scr):
    """One tile of _TR independent windows: la/lb [e, _TR] -> bits [e, _TR].

    first/tail [1, _TR] 0/1 flags: first=1 rows start pinned to state 0,
    others uniform; tail=1 rows terminate in state 0, others trace back
    from their best surviving state. Rows are processed _SUB at a time so
    the [e, _SUB, 64] decision scratch fits VMEM.
    """
    neg = jnp.float32(-1e30)
    state_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 64), 1)
    sa, sb = sa_ref[:], sb_ref[:]
    p0, p1 = p0_ref[:], p1_ref[:]

    for sub in range(_TR // _SUB):
        lo = sub * _SUB                               # static lane offset
        first = first_ref[0, lo:lo + _SUB][:, None]   # [_SUB, 1]
        tail = tail_ref[0, lo:lo + _SUB][:, None]
        pm_scr[:] = jnp.where((state_iota != 0) & (first > 0.5), neg, 0.0)

        def fwd(t, _):
            la_t = la_ref[t, lo:lo + _SUB][:, None]
            lb_t = lb_ref[t, lo:lo + _SUB][:, None]
            pm = pm_scr[:]
            # no 0.5 scale — exact power-of-two metric scaling keeps every
            # compare bit-identical (phy.bits.viterbi_decode.acs); bm1 ==
            # -bm0 exactly (both generator polys tap the oldest register
            # bit — phy.bits.viterbi_decode), halving the bm arithmetic
            bm0 = sa[0][None] * la_t + sb[0][None] * lb_t
            c0 = _MM(pm, p0) + bm0
            c1 = _MM(pm, p1) - bm0
            choice = c1 > c0                          # tie -> pred 0
            pm_scr[:] = jnp.where(choice, c1, c0)
            dec_ref[t] = choice.astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, e, fwd, 0)

        pm_f = pm_scr[:] + jnp.where((state_iota != 0) & (tail > 0.5),
                                     neg, 0.0)
        mx = jnp.max(pm_f, axis=1, keepdims=True)
        state_f = jnp.min(jnp.where(pm_f >= mx, state_iota, 64), axis=1,
                          keepdims=True).astype(jnp.int32)

        def bwd(i, state):
            t = e - 1 - i
            bit = (state >> 5) & 1
            oh = (state_iota == state).astype(jnp.float32)
            d = jnp.sum(dec_ref[t] * oh, axis=1, keepdims=True)
            bits_ref[t, lo:lo + _SUB] = bit[:, 0].astype(jnp.float32)
            return ((state & 31) << 1) | d.astype(jnp.int32)

        jax.lax.fori_loop(0, e, bwd, state_f)


def _vit_kernel_shuffle(e: int, la_ref, lb_ref, first_ref, tail_ref,
                        tblf_ref, pw_ref, bits_ref, dec_ref, pm_scr):
    """v2 kernel: STATES on sublanes (64), window-rows on lanes (_TR=128).

    vs the matmul kernel: the predecessor shuffle pred[p][s'] =
    ((s'<<1)|p) & 63 becomes a SUBLANE-strided slice tiled twice (a cheap
    vreg shuffle; lane-dim strides are unsupported but sublane strides
    lower fine — probed on-chip), branch metrics broadcast from [64, 1]
    sign columns, and decisions are BIT-PACKED over states into two int32
    words per row ([e, 2, _TR] scratch = e KB), so all 128 lanes process
    distinct windows in one pass with no MXU dependency chain and no row
    sub-batching. Bit 31 rides the int32 sign bit (disjoint-bit adds are
    exact; arithmetic shifts don't disturb (w >> k) & 1) — probed exact.

    Numerics identical to the matmul kernel and phy.bits decoders: same
    single-term f32 adds, same strict-'>' tie-break, same first-max
    traceback entry.
    """
    neg = jnp.float32(-1e30)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (64, _TR), 0)
    first = first_ref[0, :][None, :]                  # [1, _TR]
    tail = tail_ref[0, :][None, :]
    pm_scr[:] = jnp.where((s_iota != 0) & (first > 0.5), neg, 0.0)
    sa0 = tblf_ref[:, 0:1]                            # [64, 1] sign cols
    sb0 = tblf_ref[:, 2:3]    # (cols 1/3 hold sa1/sb1 == -sa0/-sb0, unused)
    pw = pw_ref[:]                                    # [64, 1] 1<<(s%32)

    def fwd(t, _):
        la_t = la_ref[t, :][None, :]                  # [1, _TR]
        lb_t = lb_ref[t, :][None, :]
        # REF-level strided sublane reads: a strided slice of a loaded
        # VALUE lowers as an unsupported gather, but strided ref reads
        # lower fine (probed on-chip)
        h0 = pm_scr[0::2, :]
        h1 = pm_scr[1::2, :]
        # no 0.5 scale on the branch metrics — exact power-of-two metric
        # scaling keeps every compare bit-identical (phy.bits decoders);
        # bm1 == -bm0 exactly (both generator polys tap the oldest
        # register bit), so one bm evaluation serves both candidates
        bm0 = sa0 * la_t + sb0 * lb_t
        c0 = jnp.concatenate([h0, h0], axis=0) + bm0
        c1 = jnp.concatenate([h1, h1], axis=0) - bm0
        choice = c1 > c0                              # tie -> pred 0
        pm_scr[:] = jnp.where(choice, c1, c0)
        b = choice.astype(jnp.int32) * pw             # disjoint bits
        w0 = jnp.sum(b[0:32], axis=0, keepdims=True)  # [1, _TR]
        w1 = jnp.sum(b[32:64], axis=0, keepdims=True)
        dec_ref[t] = jnp.concatenate([w0, w1], axis=0)
        return 0

    jax.lax.fori_loop(0, e, fwd, 0)

    pm_f = pm_scr[:] + jnp.where((s_iota != 0) & (tail > 0.5), neg, 0.0)
    mx = jnp.max(pm_f, axis=0, keepdims=True)
    state_f = jnp.min(jnp.where(pm_f >= mx, s_iota, 64), axis=0,
                      keepdims=True).astype(jnp.int32)   # [1, _TR]

    def bwd(i, state):
        t = e - 1 - i
        bit = (state >> 5) & 1
        dec_t = dec_ref[t]                            # [2, _TR]
        word = jnp.where(state >= 32, dec_t[1:2, :], dec_t[0:1, :])
        d = (word >> (state & 31)) & 1
        bits_ref[t, :] = bit[0].astype(jnp.float32)
        return ((state & 31) << 1) | d

    jax.lax.fori_loop(0, e, bwd, state_f)


@functools.lru_cache(maxsize=4)
def _shuffle_consts() -> tuple[np.ndarray, np.ndarray]:
    """([64, 8] f32 sign columns sa0|sa1|sb0|sb1, [64, 1] int32 bit values)."""
    sa, sb = _vit_consts()
    tblf = np.zeros((64, 8), np.float32)
    tblf[:, 0] = sa[0]
    tblf[:, 1] = sa[1]
    tblf[:, 2] = sb[0]
    tblf[:, 3] = sb[1]
    pw = (np.uint32(1) << (np.arange(64, dtype=np.uint32) % 32)).astype(
        np.uint32).view(np.int32).reshape(64, 1)
    return tblf, pw


def _run_windows(law, lbw, first, tail, e: int,
                 impl: str = "shuffle") -> jax.Array:
    """law/lbw [e, R] time-major rows + per-row flags [R] -> bits [e, R].

    impl: 'shuffle' (default — states on sublanes, bit-packed decisions)
    or 'mm' (one-hot-matmul variant, the proven fallback). Plumbed from
    WaveformSpec.viterbi_impl — a static spec field, so two pipelines in
    one process can use different kernels and changes re-jit by design
    (an env var read at trace time would be silently frozen).
    """
    r = law.shape[1]
    pad = (-r) % _TR
    if pad:
        z = jnp.zeros((e, pad), jnp.float32)
        law = jnp.concatenate([law, z], axis=1)
        lbw = jnp.concatenate([lbw, z], axis=1)
        zf = np.zeros(pad, np.float32)
        first = np.concatenate([first, zf])
        tail = np.concatenate([tail, zf])
    rt = law.shape[1]
    vmem = pltpu.VMEM
    spec_col = pl.BlockSpec((e, _TR), lambda i: (0, i), memory_space=vmem)
    spec_flag = pl.BlockSpec((1, _TR), lambda i: (0, i), memory_space=vmem)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=vmem)
    if impl == "shuffle":
        tblf, pw = _shuffle_consts()
        bits = pl.pallas_call(
            functools.partial(_vit_kernel_shuffle, e),
            grid=(rt // _TR,),
            in_specs=[spec_col, spec_col, spec_flag, spec_flag,
                      full((64, 8)), full((64, 1))],
            out_specs=spec_col,
            out_shape=jax.ShapeDtypeStruct((e, rt), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((e, 2, _TR), jnp.int32),
                pltpu.VMEM((64, _TR), jnp.float32),
            ],
            interpret=_interpret(),
        )(law, lbw, jnp.asarray(first[None, :]), jnp.asarray(tail[None, :]),
          jnp.asarray(tblf), jnp.asarray(pw))
        return bits[:, :r]
    sa, sb = _vit_consts()
    p0, p1 = _perm_mats()
    bits = pl.pallas_call(
        functools.partial(_vit_kernel, e),
        grid=(rt // _TR,),
        in_specs=[spec_col, spec_col, spec_flag, spec_flag,
                  full((2, 64)), full((2, 64)),
                  full((64, 64)), full((64, 64))],
        out_specs=spec_col,
        out_shape=jax.ShapeDtypeStruct((e, rt), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((e, _SUB, 64), jnp.float32),
            pltpu.VMEM((_SUB, 64), jnp.float32),
        ],
        interpret=_interpret(),
    )(law, lbw, jnp.asarray(first[None, :]), jnp.asarray(tail[None, :]),
      jnp.asarray(sa), jnp.asarray(sb), jnp.asarray(p0), jnp.asarray(p1))
    return bits[:, :r]


def viterbi_pallas_windowed(llr: jax.Array, window: int = 256,
                            overlap: int = 64,
                            impl: str = "shuffle") -> jax.Array:
    """Windowed-parallel Viterbi, fused per-window in Pallas.

    Same sliding-window construction as phy.bits.viterbi_decode_windowed
    (geometry differs: 256/64 vs 512/96 — chosen so the [E, _SUB, 64]
    decision scratch stays small; overlap 64 >> 5 constraint lengths, so
    survivor merge is just as safe). Each window's whole ACS + traceback
    runs inside ONE Pallas program with VMEM-resident decisions.
    """
    bsz, n2 = llr.shape
    n = n2 // 2
    l, ov = window, overlap
    e = l + 2 * ov
    if n <= e:
        return viterbi_pallas(llr, impl=impl)
    w = -(-n // l)
    starts = np.clip(np.arange(w) * l - ov, 0, n - e)        # [W] static

    la = llr[:, 0::2].astype(jnp.float32)                    # [B, n]
    lb = llr[:, 1::2].astype(jnp.float32)

    # [B, n] -> [E, B*W] rows, time sublane-major (static slices only)
    def rows(a):
        return jnp.stack([a[:, s:s + e] for s in starts],
                         axis=1).reshape(bsz * w, e).T
    law, lbw = rows(la), rows(lb)
    first = np.tile((starts == 0).astype(np.float32), bsz)   # [B*W]
    tail = np.tile((starts + e == n).astype(np.float32), bsz)

    bits = _run_windows(law, lbw, first, tail, e, impl=impl)
    bits_bwe = bits.T.reshape(bsz, w, e)
    off = np.arange(w) * l - starts                          # [W] static
    owned = jnp.concatenate(
        [bits_bwe[:, wi, off[wi]:off[wi] + l] for wi in range(w)], axis=1)
    return owned[:, :n].astype(jnp.uint8)


def viterbi_pallas(llr: jax.Array, impl: str = "shuffle") -> jax.Array:
    """Soft-input rate-1/2 K=7 Viterbi; llr [B, 2n] -> bits [B, n] uint8.

    Whole-sequence fused decode when the per-tile VMEM footprint fits
    (decision scratch + the la/lb/bits column blocks; ~16 MB VMEM/core);
    otherwise the windowed-parallel kernel. The gate is per-impl: the
    shuffle kernel's [e, 2, 128] int32 decision scratch is 8x smaller than
    the mm kernel's [e, 32, 64] f32, so it decodes up to ~2.4k-step
    trellises whole-sequence (vs ~600 for mm). The trellis is padded to a
    multiple of 8 steps (sublane constraint) with certainty-of-zero LLRs:
    the encoder is tail-terminated in state 0, and appended zero-input
    steps keep the optimal path in state 0, so the decisions for the true
    steps are unchanged and the pad bits are dropped.
    """
    bsz, n2 = llr.shape
    n = n2 // 2
    e = -(-n // 8) * 8
    # per-trellis-step VMEM bytes per tile: decision scratch + the three
    # [e, _TR] f32 column blocks (la, lb, bits)
    dec_bytes = 2 * _TR * 4 if impl == "shuffle" else _SUB * 64 * 4
    if e * (dec_bytes + 3 * _TR * 4) > 6 * 1024 * 1024:
        return viterbi_pallas_windowed(llr, impl=impl)
    la = llr[:, 0::2].astype(jnp.float32).T      # [n, B] time sublane-major
    lb = llr[:, 1::2].astype(jnp.float32).T
    if e != n:
        padrows = jnp.full((e - n, bsz), _BIG, jnp.float32)
        la = jnp.concatenate([la, padrows])
        lb = jnp.concatenate([lb, padrows])
    ones = np.ones(bsz, np.float32)
    bits = _run_windows(la, lb, ones, ones, e, impl=impl)
    return bits[:n].T.astype(jnp.uint8)
