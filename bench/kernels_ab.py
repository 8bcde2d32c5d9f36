"""Kernel A/B: Pallas vs XLA, correctness + throughput per kernel.

Covers the flagship sizes the VERDICT flagged as unproven on hardware:
fft-1024, the fused Viterbi at C3 trellis length (n=6912), FIR/polyphase,
and the S&C correlator. Uses the hardened timing protocol
(metrics.timed_loop). Run on the real chip:

    python bench/kernels_ab.py [--iters 4] [--jsonl bench/results/kab.jsonl]
"""

from __future__ import annotations

import argparse
import os
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--jsonl", default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny sizes + rep spans: CPU trace/correctness "
                         "check of every row before a tunnel session "
                         "(numbers are meaningless)")
    ap.add_argument("--only", default=None,
                    help="comma-separated kernel-name substrings: run "
                         "matching rows only (targeted re-measures)")
    args = ap.parse_args()
    only = args.only.split(",") if args.only else None
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    import jax.numpy as jnp
    import numpy as np
    from ofdm_uhd_tpu.core.boundary import device_put_planar, jit_planar
    from ofdm_uhd_tpu.metrics import JsonlLogger, timed_loop

    rng = np.random.default_rng(0)
    dev = jax.devices()[0].device_kind
    log(f"# device={dev}")
    results = []
    PEAK_HBM_GBS = 819.0  # v5e HBM peak (bench/roofline.py anchor)

    import jax.numpy as _jnp
    import jax as _jax

    # rep span sized so the slope RISES above the tunnel's floor noise:
    # these kernels run ~5-60 us/rep at SoL, and the same-executable floor
    # still jitters ~tens of ms, so ~2k reps (~10-100 ms of marginal work)
    # are needed for a measurable difference
    K_STACK, R_LO, R_HI = 8, 64, 2048
    DIV = 1
    if args.smoke:
        K_STACK, R_LO, R_HI = 2, 2, 4
        DIV = 16

    def _loop_fn(fn, ks=K_STACK):
        """reps kernel applications inside ONE dispatch: fori_loop with a
        TRACED trip count over ks stacked perturbed inputs (cycled),
        reducing each output into a scalar accumulator (keeps every
        application live and sequential; distinct inputs defeat caching).
        One executable serves every reps value, so the per-dispatch floor
        is identical between timings and cancels exactly in the slope."""
        def g(stacked, reps):
            def body(i, c):
                xi = _jax.tree.map(
                    lambda s: _jax.lax.dynamic_index_in_dim(
                        s, i % ks, axis=0, keepdims=False), stacked)
                y = fn(xi)
                r = _jnp.real(y) if _jnp.iscomplexobj(y) else y
                return c + _jnp.sum(r.ravel()[:128].astype(_jnp.float32))
            return _jax.lax.fori_loop(0, reps, body, _jnp.float32(0))
        return g

    def ab(name, fn_x, fn_p, arrs, check_atol, work_samples, bytes_io=None,
           k_stack=None, r_lo=None, r_hi=None):
        """arrs: list of >=2 host inputs; asserts pallas==xla within atol.

        bytes_io: HBM bytes one iteration MUST move (inputs read + outputs
        written, the algorithm-independent minimum) — reported as achieved
        GB/s and % of the 819 GB/s chip peak, the kernel-granularity
        speed-of-light accounting BASELINE.md's roofline row prescribes.
        Two timings per backend: the plain per-dispatch loop (carries the
        tunnel's dispatch floor — ms/msps/gbs fields), and a floor-FREE
        net measurement from the slope between R_LO=64 and R_HI=2048
        in-dispatch `fori_loop` repetitions of ONE executable
        (net_ms/net_gbs/net_pct_sol fields): the floor cancels in
        (dt_hi - dt_lo) / (R_HI - R_LO).
        """
        # per-row overrides: slow kernels (e.g. viterbi at headline batch,
        # ~24 ms/rep) can't afford 2048 in-dispatch reps — 64 reps already
        # put ~1.5 s of marginal work over the floor jitter; big inputs
        # also shrink the stacked-perturbation cycle to bound HBM
        if only is not None and not any(s in name for s in only):
            return
        ks = k_stack or K_STACK
        rlo = r_lo or R_LO
        rhi = r_hi or R_HI
        xs = [device_put_planar(a) for a in arrs]
        # stacked [ks, ...] perturbed copies for the in-dispatch loop
        base = arrs[0]
        stack_np = np.stack([base * (1 + np.float32(1e-6) * i)
                             if np.issubdtype(base.dtype, np.floating)
                             or np.issubdtype(base.dtype, np.complexfloating)
                             else base for i in range(ks)])
        stacked = device_put_planar(stack_np)
        row = {"kernel": name, "device": dev}
        if bytes_io is not None:
            row["bytes_io"] = int(bytes_io)
        try:
            ref = np.asarray(jit_planar(fn_x)(xs[0]))
        except Exception as e:
            log(f"# {name}: xla FAILED {type(e).__name__} {str(e)[:120]}")
            return
        for tag, fn in (("xla", fn_x), ("pallas", fn_p)):
            if fn is None:
                continue
            jf = jit_planar(fn)
            try:
                got = np.asarray(jf(xs[0]))
                err = float(np.max(np.abs(got.astype(np.float64)
                                          - ref.astype(np.float64))))
                dt, _ = timed_loop(jf, [(x,) for x in xs], args.iters)
                row[f"{tag}_ms"] = round(dt * 1e3, 3)
                row[f"{tag}_msps"] = round(work_samples / dt / 1e6, 1)
                row[f"{tag}_maxerr"] = err
                gbs_txt = ""
                if bytes_io is not None:
                    gbs = bytes_io / dt / 1e9
                    row[f"{tag}_gbs"] = round(gbs, 1)
                    row[f"{tag}_pct_sol"] = round(100 * gbs / PEAK_HBM_GBS, 1)
                    gbs_txt = (f"  {gbs:7.1f} GB/s"
                               f" ({100 * gbs / PEAK_HBM_GBS:5.1f}% SoL)")
                # floor-free net timing: slope between two traced rep
                # counts of ONE executable (the floor cancels exactly)
                net_txt = ""
                try:
                    jg = jit_planar(_loop_fn(fn, ks))
                    r_loj = _jnp.int32(rlo)
                    r_hij = _jnp.int32(rhi)
                    dt_lo, _ = timed_loop(jg, [(stacked, r_loj),
                                               (stacked, r_hij)], 2)
                    dt_lo, _ = timed_loop(jg, [(stacked, r_loj)], args.iters)
                    dt_hi, _ = timed_loop(jg, [(stacked, r_hij)], args.iters)
                    slope = dt_hi - dt_lo
                    if slope <= 0:
                        raise RuntimeError(
                            f"slope buried in floor noise (dt_lo "
                            f"{dt_lo*1e3:.1f} ms >= dt_hi {dt_hi*1e3:.1f})")
                    net = slope / (rhi - rlo)
                    if (bytes_io is not None
                            and bytes_io / net / 1e9 > 2 * PEAK_HBM_GBS):
                        raise RuntimeError(
                            f"implausible {bytes_io/net/1e9:.0f} GB/s "
                            f"(> 2x HBM peak): floor noise")
                    row[f"{tag}_net_ms"] = round(net * 1e3, 4)
                    if bytes_io is not None:
                        ngbs = bytes_io / net / 1e9
                        row[f"{tag}_net_gbs"] = round(ngbs, 1)
                        row[f"{tag}_net_pct_sol"] = round(
                            100 * ngbs / PEAK_HBM_GBS, 1)
                        net_txt = (f"  net {net*1e3:7.3f} ms"
                                   f" {ngbs:6.1f} GB/s"
                                   f" ({100*ngbs/PEAK_HBM_GBS:5.1f}% SoL)")
                except Exception as e:
                    row[f"{tag}_net_error"] = (f"{type(e).__name__}: "
                                               f"{str(e)[:120]}")
                ok = err <= check_atol
                log(f"# {name:<16} {tag:<6} {dt*1e3:8.2f} ms  "
                    f"{work_samples/dt/1e6:9.1f} Msps{gbs_txt}{net_txt}  "
                    f"maxerr {err:.2e}"
                    f"{'' if ok else '  **EXCEEDS ATOL**'}")
            except Exception as e:
                row[f"{tag}_error"] = f"{type(e).__name__}: {str(e)[:160]}"
                log(f"# {name:<16} {tag:<6} FAILED {row[f'{tag}_error']}")
        if "xla_ms" in row and "pallas_ms" in row:
            row["pallas_speedup"] = round(row["xla_ms"] / row["pallas_ms"], 2)
        if "xla_net_ms" in row and "pallas_net_ms" in row:
            row["pallas_net_speedup"] = round(
                row["xla_net_ms"] / row["pallas_net_ms"], 2)
        results.append(row)
        # INCREMENTAL jsonl write: a later row can crash the TPU worker
        # outright (the r5 ilv net-loop fault took the whole process —
        # r5_session2.log), and end-of-run logging would lose everything
        # measured before it
        if args.jsonl:
            JsonlLogger(args.jsonl).log(row)

    # ---- FFT at every spec size, incl. the flagship 1024 ----
    from ofdm_uhd_tpu.kernels.fft import fft as kfft
    for n, b in ((64, 8192 // DIV), (256, 2048 // DIV), (1024, 512 // DIV)):
        x = (rng.normal(size=(b, n)) + 1j * rng.normal(size=(b, n))
             ).astype(np.complex64)
        arrs = [x * np.float32(1 + 1e-6 * i) for i in range(2)]
        ab(f"fft-{n}", lambda v, n=n: kfft(v, backend="xla"),
           lambda v, n=n: kfft(v, backend="pallas"), arrs,
           check_atol=2e-5 * np.sqrt(n), work_samples=b * n,
           bytes_io=16 * b * n)

    # ---- fused CP-strip FFT / IFFT+CP vs the slice+fft / ifft+concat
    # forms the chain otherwise runs (VERDICT r2 item 4: make the Pallas
    # tier win at the sizes the chain actually uses) ----
    from ofdm_uhd_tpu.kernels.pallas_fft import (cp_strip_fft_pallas,
                                                 ifft_cp_pallas)
    for n, cp, b in ((64, 16, 8192 // DIV), (256, 32, 4160 // DIV)):
        sl, start = n + cp, cp - min(4, cp // 4)
        x = (rng.normal(size=(b, sl)) + 1j * rng.normal(size=(b, sl))
             ).astype(np.complex64)
        arrs = [x * np.float32(1 + 1e-6 * i) for i in range(2)]
        ab(f"cpfft-{n}",
           lambda v, n=n, s=start: kfft(
               jax.lax.slice_in_dim(v, s, s + n, axis=-1), backend="xla"),
           lambda v, n=n, s=start: cp_strip_fft_pallas(v, s, n), arrs,
           check_atol=2e-5 * np.sqrt(n), work_samples=b * n,
           bytes_io=8 * b * (sl + n))
        g = (rng.normal(size=(b, n)) + 1j * rng.normal(size=(b, n))
             ).astype(np.complex64)
        garrs = [g * np.float32(1 + 1e-6 * i) for i in range(2)]

        from ofdm_uhd_tpu.kernels.fft import ifft as kfft_i

        def ifft_concat(v, cp=cp):
            y = kfft_i(v, backend="xla")
            return jnp.concatenate([y[..., -cp:], y], axis=-1)

        ab(f"ifftcp-{n}", ifft_concat,
           lambda v, cp=cp: ifft_cp_pallas(v, cp), garrs,
           check_atol=2e-5 * np.sqrt(n), work_samples=b * n,
           bytes_io=8 * b * (sl + n))

    # ---- FIR / polyphase ----
    # work_samples convention for the resampler family: RADIO-rate samples
    # (decim: input rate n; interp: output rate n) — the common currency
    # of the C4 chain, so the Msps columns are comparable across the
    # family. GB/s columns use each kernel's true minimum bytes.
    from ofdm_uhd_tpu.kernels import fir as K2
    from ofdm_uhd_tpu.phy.tables import resample_filter
    taps = np.asarray(resample_filter(8, 1))
    n = (1 << 20) // DIV
    x = (rng.normal(size=(n,)) + 1j * rng.normal(size=(n,))
         ).astype(np.complex64)
    arrs = [x * np.float32(1 + 1e-6 * i) for i in range(2)]
    # row named from the REAL tap count (ADVICE r4: resample_filter(8,1)
    # returns 193 taps, and the policy audit keys the fir winner on this)
    ab(f"fir-{len(taps)}t", lambda v: K2.fir_filter(v, taps, backend="xla"),
       lambda v: K2.fir_filter(v, taps, backend="pallas"), arrs,
       check_atol=1e-3, work_samples=n, bytes_io=16 * n)
    # (no HIGH-precision row: Mosaic rejects Precision.HIGH in-kernel
    # — 'Unsupported dot precision', r4 + r5 on-chip)
    import jax as _j  # noqa: F401  (used by the bf16 row below)
    from ofdm_uhd_tpu.kernels.pallas_fir_mxu import fir_mxu_pallas
    # bf16 (DEFAULT, 1-pass) variant — the spec.filter_precision='bf16'
    # accuracy-gated tier (EVM-grade; ~4e-3 relative)
    ab(f"fir-{len(taps)}t-mxu-bf16",
       lambda v: K2.fir_filter(v, taps, backend="xla"),
       lambda v: fir_mxu_pallas(v, taps, precision=_j.lax.Precision.DEFAULT),
       arrs, check_atol=5e-2, work_samples=n, bytes_io=16 * n)
    from ofdm_uhd_tpu.research.pallas_shift import fir_shift_pallas
    ab(f"fir-{len(taps)}t-shift",
       lambda v: K2.fir_filter(v, taps, backend="xla"),
       lambda v: fir_shift_pallas(v, taps),
       arrs, check_atol=1e-3, work_samples=n, bytes_io=16 * n)
    ab("decim-8x", lambda v: K2.polyphase_decim(v, 8, taps, backend="xla"),
       lambda v: K2.polyphase_decim(v, 8, taps, backend="pallas"), arrs,
       check_atol=1e-3, work_samples=n, bytes_io=9 * n)
    xs_small = [a[: n // 8] for a in arrs]
    ab("interp-8x", lambda v: K2.polyphase_interp(v, 8, taps, backend="xla"),
       lambda v: K2.polyphase_interp(v, 8, taps, backend="pallas"), xs_small,
       check_atol=1e-3, work_samples=n, bytes_io=9 * n)
    # (r5) the INTERLEAVED filter tier was measured here and LOST ~30x
    # (no free complex bitcast on this backend: .view is a scatter,
    # explicit interleave is a pathological minor-dim-2 relayout); it
    # lives in research/pallas_fir_ilv.py with the probe numbers.

    # ---- S&C correlator ----
    from ofdm_uhd_tpu.kernels.sync import sc_correlate, sc_metric
    ab("sc-corr-128", lambda v: sc_metric(*sc_correlate(v, 128, "xla")),
       lambda v: sc_metric(*sc_correlate(v, 128, "pallas")), arrs,
       check_atol=1e-2, work_samples=n, bytes_io=12 * n)

    # NOTE no isolated extract row here, deliberately: the isolated gather
    # measures ~470 GB/s (it is fast out of context) while the Pallas DMA
    # extraction's win is CONTEXTUAL — it de-pathologizes the gather's
    # consumers inside the chain (probe20-23). The authoritative A/B is
    # the chain-level scripts/r5_probe_extract.py ->
    # bench/results/r5_probe_extract.jsonl (full-g vs full-p), which
    # tests/kernels/test_policy_matches_bench.py audits directly.

    # ---- Viterbi at C3 flagship length (n=6912), batch SWEEP ----
    # The scan/fused crossover is the policy table's viterbi bound
    # (kernels/policy.py _VITERBI_PALLAS_MAX_BATCH): batch 130 = one C3
    # capture (the latency regime where the fused kernel measured 4.92x),
    # 4160 = the 32-capture headline dispatch, 1040 brackets the
    # crossover. Slow rows use an 8->64 rep span (each rep is tens of ms;
    # 56 marginal reps are already ~1 s over the floor jitter) and a
    # smaller perturbation stack to bound HBM.
    from ofdm_uhd_tpu.phy.bits import (conv_encode, viterbi_decode,
                                       viterbi_decode_windowed)
    from ofdm_uhd_tpu.kernels.pallas_viterbi import viterbi_pallas
    nb = 6912
    vit_rows = ((130, "", (64, 2048)), (1040, "-b1040", (8, 128)),
                (4160, "-b4160", (8, 64)))
    if args.smoke:
        vit_rows = ((16, "", (2, 4)), (32, "-b1040", (2, 4)))
    for bsz, suffix, rspan in vit_rows:
        bits = rng.integers(0, 2, (bsz, nb)).astype(np.uint8)
        bits[:, -6:] = 0
        coded = np.asarray(conv_encode(jnp.asarray(bits)))
        llr = ((1.0 - 2.0 * coded)
               + rng.normal(0, 0.5, coded.shape)).astype(np.float32)
        arrs = [llr * np.float32(1 + 1e-5 * i) for i in range(2)]
        ab(f"viterbi-6912{suffix}", viterbi_decode, viterbi_pallas, arrs,
           check_atol=0, work_samples=bsz * nb, bytes_io=9 * bsz * nb,
           k_stack=2 if bsz > 200 else None,
           r_lo=rspan[0], r_hi=rspan[1])
        # windowed-XLA rows at every batch: at 130 it measured 1.43 ms —
        # faster than even the fused kernel — so the decoder-ALGORITHM
        # choice (scan vs windowed vs fused) needs the full grid
        ab(f"viterbi-win-6912{suffix and '-b' + str(bsz) if suffix else ''}",
           viterbi_decode_windowed, None, arrs,
           check_atol=0, work_samples=bsz * nb, bytes_io=9 * bsz * nb,
           k_stack=2 if bsz > 200 else None,
           r_lo=rspan[0], r_hi=rspan[1])
        if bsz == 4160:
            # geometry sweep at the headline batch: window=512/overlap=96
            # spends 2*96/512 = 37% of its ACS on overlap; 1024/96 cuts
            # that to ~19% — the knob that could retake the scan's 23.4 ms
            ab("viterbi-win1024-6912-b4160",
               lambda v: viterbi_decode_windowed(v, window=1024, overlap=96),
               None, arrs, check_atol=0, work_samples=bsz * nb,
               bytes_io=9 * bsz * nb, k_stack=2,
               r_lo=rspan[0], r_hi=rspan[1])

    import json
    print(json.dumps(results, indent=None))


if __name__ == "__main__":
    main()
