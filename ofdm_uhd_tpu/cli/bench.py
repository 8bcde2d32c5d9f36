"""Bench tool: per-config throughput/EVM with optional profiler trace
(SURVEY.md §3.6, §5.1). The repo-root bench.py wraps this for the judged
one-line JSON output."""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
from ..core import platform

from . import config as C


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    C.add_common_args(p)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--mode", choices=["aligned", "capture", "stream"],
                   default="capture")
    p.add_argument("--trace-dir", default=None,
                   help="write a jax.profiler trace (Perfetto) here")
    p.add_argument("--jsonl", default=None, help="append results to JSONL")
    args = p.parse_args(argv)
    platform.honor_env()  # sitecustomize overrides JAX_PLATFORMS; re-apply caller intent

    import jax
    from ..core.spec import ChannelSpec
    from ..channel import apply_channel, make_capture
    from ..golden import GoldenModem
    from ..pipeline import TxPipeline, RxPipeline
    from ..metrics import JsonlLogger

    spec = C.spec_from_args(args)
    rng = np.random.default_rng(args.seed)
    payloads = rng.integers(
        0, 2, (args.frames, spec.payload_bits_per_frame)).astype(np.uint8)
    # CFO is expressed in subcarrier spacings at BASEBAND; captures carry it
    # at the radio rate, where the same per-sample ramp reads 1/L as large.
    cfo_bb = 0.8 if args.mode != "aligned" else 0.0
    ch = ChannelSpec(snr_db=28.0, cfo=cfo_bb / spec.resample_l,
                     timing_offset=100 if args.mode != "aligned" else 0)

    if args.mode == "aligned":
        frames = platform.fetch(TxPipeline(spec)(payloads))
        rx_in = np.stack([apply_channel(frames[i], ch, spec.n_sc, seed=i)
                          for i in range(args.frames)])
        rx = RxPipeline(spec, shift=min(4, spec.cp // 4))
        from ..core.boundary import device_put_planar
        x = device_put_planar(rx_in)
        run = lambda: rx.rx_aligned(x)
        n_samples = rx_in.size
    elif args.mode == "stream":
        return _bench_stream(args, spec, payloads, ch)
    else:
        gm = GoldenModem(spec)
        fr = platform.fetch(TxPipeline(spec)(payloads))  # radio rate
        cap = make_capture(np.asarray(fr), ch, spec.n_sc, gap=300,
                           seed=args.seed).astype(np.complex64)
        rx = RxPipeline(spec)
        from ..core.boundary import device_put_planar
        x = device_put_planar(cap)
        run = lambda: rx.rx_capture(x, max_frames=args.frames + 2)
        n_samples = len(cap)

    out = jax.block_until_ready(run())     # compile + warmup
    n_ok = int(np.asarray(out["crc_ok"]).sum())

    def timed():
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o = run()
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            dt = timed()
    else:
        dt = timed()

    sps = n_samples * args.iters / dt
    rec = {
        "config": args.config, "mode": args.mode,
        "backend": spec.kernel_backend,
        "device": jax.devices()[0].device_kind,
        "msamples_per_s": round(sps / 1e6, 3),
        "frames_per_s": round(n_ok * args.iters / dt, 1),
        "frames_ok": n_ok, "frames": args.frames,
        "evm_db": round(float(np.mean(np.asarray(out["evm_db"]))), 2),
    }
    if args.jsonl:
        JsonlLogger(args.jsonl).log(rec)
    print(json.dumps(rec))


def _bench_stream(args, spec, payloads, ch):
    """Continuous-stream throughput: StreamRx over a radio-rate capture,
    steady-state, counting input samples at the RADIO rate (the judged
    frames/s + Msamples/s for C4/C5's streaming configurations)."""
    import jax
    from ..channel import make_capture
    from ..metrics import JsonlLogger
    from ..pipeline import TxPipeline
    from ..pipeline.stream import StreamRx

    fr = np.asarray(platform.fetch(TxPipeline(spec)(payloads)))
    cap = make_capture(fr, ch, spec.n_sc, gap=300,
                       seed=args.seed).astype(np.complex64)
    rx = StreamRx(spec)
    # pad the tail so every iteration feeds whole chunks (steady state)
    pad = (-len(cap)) % rx.radio_chunk
    cap = np.concatenate([cap, np.zeros(pad, np.complex64)])

    got = rx.process(cap)                      # compile + warmup pass
    t0 = time.perf_counter()
    n_ok = 0
    for _ in range(args.iters):
        got = rx.process(cap)
        n_ok += sum(g.crc_ok for g in got)
    dt = time.perf_counter() - t0
    got = rx.flush()
    n_ok += sum(g.crc_ok for g in got)

    sps = len(cap) * args.iters / dt
    rec = {
        "config": args.config, "mode": "stream",
        "backend": spec.kernel_backend,
        "device": jax.devices()[0].device_kind,
        "n_devices": rx.mesh.size,
        "chunk_len": rx.chunk_len,
        "msamples_per_s": round(sps / 1e6, 3),
        "frames_per_s": round(n_ok / dt, 1),
        "frames_ok": n_ok, "frames": args.frames * args.iters,
    }
    if args.jsonl:
        JsonlLogger(args.jsonl).log(rec)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
