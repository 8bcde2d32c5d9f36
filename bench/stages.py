"""Per-stage timing of the capture RX chain — where do the milliseconds go?

Times each chain stage as its own jitted function on the active backend
(TPU via the axon tunnel, or CPU) so optimization is measurement-driven
(SURVEY.md §5.1 observability; VERDICT r1 item 1: close the roofline gap).

Stage boundaries mirror pipeline/rx._rx_capture:
  corr      sc_correlate + sc_metric over the capture
  detect    detect_frames (includes corr; the delta is the slot search)
  extract   extract + fractional/integer CFO correction
  frontend  FFT -> chanest/EQ/CPE -> LLR demap (aligned frames)
  viterbi   deinterleave + Viterbi + descramble + CRC
  full      the fused rx_capture graph

Usage: python bench/stages.py [--backend xla|pallas] [--frames 128]
       [--iters 5] [--batch 1]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _force(out):
    """Force completion through the tunnel: fetch the smallest leaf.

    block_until_ready alone is NOT trusted on the axon runtime (measured
    0.14 ms for the full 554k-sample chain — it does not wait); a host
    fetch of an output leaf serializes on that execution's completion."""
    import jax
    import numpy as np
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "size")]
    leaves.sort(key=lambda a: a.size)
    return np.asarray(leaves[0])


def time_fn(fn, argsets, iters):
    """argsets: list of distinct pre-staged arg tuples (cycled) so a
    result-caching runtime cannot collapse the loop. Warmup touches EVERY
    argset (device_put through the tunnel is lazy — an untouched variant
    would upload inside the timed region). EVERY iteration's output is
    kept alive and force-fetched: dropping an output's last reference lets
    a lazy runtime cancel the computation outright."""
    for a in argsets:
        out = fn(*a)
    _force(out)
    t0 = time.perf_counter()
    outs = [fn(*argsets[i % len(argsets)]) for i in range(iters)]
    for o in outs:
        _force(o)
    return (time.perf_counter() - t0) / iters, outs[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="xla")
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1,
                    help="captures per dispatch (vmapped)")
    ap.add_argument("--config", default="c3")
    ap.add_argument("--net", action="store_true",
                    help="add floor-free net per-stage timing (traced-rep "
                         "slope, bench_lib.net_time): the per-dispatch "
                         "floor cancels, so stage attribution is valid "
                         "even on slow-tunnel days")
    ap.add_argument("--jsonl", default=None,
                    help="append the per-stage profile (ms) as one JSONL "
                         "record — bench/roofline.py --stages-jsonl "
                         "cross-checks its cost model against it")
    args = ap.parse_args()

    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ofdm_uhd_tpu.core.spec import config
    from ofdm_uhd_tpu.core.boundary import device_put_planar, jit_planar
    from ofdm_uhd_tpu.phy import sync as PS
    from ofdm_uhd_tpu.phy import bits as PB
    from ofdm_uhd_tpu.kernels.sync import sc_correlate, sc_metric
    from ofdm_uhd_tpu.pipeline import rx as RXP
    from ofdm_uhd_tpu.pipeline.rx import RxPipeline
    from bench_lib import build_capture  # noqa: E402

    spec = config(args.config).with_(kernel_backend=args.backend)
    cap, payloads = build_capture(spec, args.frames, gap=300)
    n = len(cap)
    mf = args.frames + 2
    log(f"# device={jax.devices()[0].device_kind} capture={n} samples "
        f"backend={args.backend} batch={args.batch}")

    def variants(a, k=3):
        """k distinct device-resident copies (tiny scale jitter)."""
        return [device_put_planar(a * np.float32(1.0 + 1e-6 * i))
                for i in range(k)]

    xs = variants(cap)
    results = {}
    results_net = {}

    def stage(name, fn, argsets, scale=1, raw=None):
        try:
            dt, _ = time_fn(fn, argsets, args.iters)
        except Exception as e:
            log(f"# {name}: FAILED {type(e).__name__}: {str(e)[:160]}")
            return
        results[name] = dt
        net_txt = ""
        if args.net and raw is not None:
            # net timing must trace the RAW fn inside the rep loop (a
            # jit_planar wrapper np-encodes at the python boundary and
            # cannot take tracers); planarize decodes the stacked Planar
            # leaves inside the trace.
            from bench_lib import net_time
            from ofdm_uhd_tpu.core import boundary
            import jax as _jax
            try:
                stacked = _jax.tree.map(
                    lambda *ls: _jax.numpy.stack(ls), *[a[0] for a in argsets])
                r_hi = max(16, min(2048, int(2.0 / max(dt, 1e-5))))
                net = net_time(boundary.planarize(raw), stacked,
                               iters=args.iters,
                               r_lo=max(2, r_hi // 16), r_hi=r_hi)
                results_net[name] = net
                net_txt = (f"   net {net*1e3:8.3f} ms "
                           f"{(scale or 1) * n / net / 1e6:9.1f} Msps")
            except Exception as e:
                net_txt = f"   net FAILED {type(e).__name__}: {str(e)[:90]}"
        log(f"# {name:<10} {dt*1e3:8.2f} ms   "
            f"{scale * n / dt / 1e6:9.1f} Msps{net_txt}")

    corr_raw = lambda c: sc_metric(*sc_correlate(
        c, spec.n_sc // 2, backend=args.backend))
    stage("corr", jit_planar(corr_raw), [(x,) for x in xs], raw=corr_raw)

    det_raw = functools.partial(PS.detect_frames, spec, max_frames=mf)
    stage("detect", jit_planar(det_raw), [(x,) for x in xs], raw=det_raw)

    def _extract(c):
        # mirrors pipeline/rx._rx_capture: policy-routed extraction +
        # two-ramp CFO order (r5)
        ds, eps_f, valid = PS.detect_frames(spec, c, mf)
        frames = PS.extract_frames(spec, c, ds,
                                   backend=spec.kernel_backend)
        frames = PS.cfo_correct(frames, eps_f, spec.n_sc)
        k = PS.integer_cfo(spec, frames)
        return PS.cfo_correct(frames, k.astype(jnp.float32), spec.n_sc)
    stage("det+ext", jit_planar(_extract), [(x,) for x in xs],
          raw=_extract)

    # aligned frames for the back half
    frames_np = np.stack([cap[:spec.frame_len]] * mf)
    fxs = variants(frames_np)
    fe_raw = functools.partial(RXP._frontend, spec, shift=4)
    stage("frontend", jit_planar(fe_raw), [(f,) for f in fxs], scale=0,
          raw=fe_raw)

    llr_np = np.random.default_rng(0).normal(
        size=(mf, spec.coded_bits_per_frame)).astype(np.float32)
    lxs = variants(llr_np)
    dec_raw = functools.partial(RXP._decode, spec)
    stage("decode", jit_planar(dec_raw), [(v,) for v in lxs], scale=0,
          raw=dec_raw)
    vit_np = np.random.default_rng(1).normal(
        size=(mf, 2 * spec.uncoded_bits_per_frame)).astype(np.float32)
    stage("vit-win", jax.jit(PB.viterbi_decode_windowed),
          [(v,) for v in variants(vit_np)], scale=0,
          raw=PB.viterbi_decode_windowed)

    rx = RxPipeline(spec)
    full_raw = functools.partial(RXP._rx_capture, spec, 0.5, True,
                                 max_frames=mf)
    stage("full", lambda c: rx.rx_capture(c, max_frames=mf),
          [(x,) for x in xs], raw=full_raw)

    if args.batch > 1:
        caps = np.stack([cap] * args.batch)
        bxs = variants(caps)
        # the PIPELINE's own batched path (capture.ndim == 2), NOT an
        # external jax.vmap: _rx_capture's internal vmap sets the
        # batch_hint that routes the decoder for the TOTAL batch — an
        # outer vmap hides it and auto mis-routes the per-capture
        # windowed decoder (116 vs 86 ms at batch 32, r5 session 7)
        braw = functools.partial(RXP._rx_capture, spec, 0.5, True,
                                 max_frames=mf)
        stage(f"full-x{args.batch}", jit_planar(braw), [(b,) for b in bxs],
              scale=args.batch, raw=braw)
        # batched per-stage attribution: the chain amortizes differently
        # under vmap (e.g. the selection scan batches its scalar steps),
        # so per-capture nets do NOT extrapolate — measure the vmapped
        # stages at the same batch as full-xN
        for nm, raw1 in (("corr", corr_raw), ("detect", det_raw),
                         ("det+ext", _extract)):
            vraw = jax.vmap(raw1)
            stage(f"{nm}-x{args.batch}", jit_planar(vraw),
                  [(b,) for b in bxs], scale=args.batch, raw=vraw)

    tot = results.get("full", 0.0)
    log(f"# stage sum (corr..decode along capture path) vs full={tot*1e3:.2f} ms")

    if args.jsonl:
        from ofdm_uhd_tpu.metrics import JsonlLogger
        JsonlLogger(args.jsonl).log({
            "config": args.config, "backend": args.backend,
            "device": jax.devices()[0].device_kind,
            "n_samples": n, "batch": args.batch, "frames": args.frames,
            "mf": mf, "frame_len": spec.frame_len,
            "stages_ms": {k: round(v * 1e3, 3) for k, v in results.items()},
            "stages_net_ms": {k: round(v * 1e3, 4)
                              for k, v in results_net.items()},
        })


if __name__ == "__main__":
    main()
