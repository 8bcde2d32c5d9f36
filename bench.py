"""Headline benchmark — prints ONE JSON line on stdout.

Judged metric (BASELINE.json:2): OFDM demod Msamples/s per chip.
Measured on the full capture-mode RX chain (polyphase -> Schmidl-Cox sync ->
CFO -> FFT -> chanest/EQ/CPE -> LLR -> Viterbi -> CRC) for the C3 waveform
(256-SC QAM-64) on the local TPU chip, steady-state (post-compile), with
jax.block_until_ready.

vs_baseline: ratio against the single-stream CPU reference chain (the
comparison target BASELINE.json C1 defines; the reference repo publishes no
numbers and its mount is empty — SURVEY.md §0/§6), measured as the golden
NumPy chain's samples/s on this host, extrapolated from a short run.

Extra diagnostics go to stderr; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _build_capture(spec, n_frames, gap, seed=0):
    from ofdm_uhd_tpu.core.spec import ChannelSpec
    from ofdm_uhd_tpu.golden import GoldenModem
    from ofdm_uhd_tpu.channel import make_capture

    rng = np.random.default_rng(seed)
    gm = GoldenModem(spec)
    payloads = rng.integers(0, 2, (n_frames, spec.payload_bits_per_frame)).astype(np.uint8)
    frames = np.stack([gm.modulate_frame(p) for p in payloads])
    ch = ChannelSpec(snr_db=28.0, cfo=0.8, phase_noise_std=2e-4, timing_offset=100)
    cap = make_capture(frames, ch, spec.n_sc, gap=gap, seed=seed)
    return cap.astype(np.complex64), payloads, gm


def bench_tpu(spec, cap, max_frames, iters=20, backend=None):
    import jax
    from ofdm_uhd_tpu.pipeline import RxPipeline

    if backend is not None:
        spec = spec.with_(kernel_backend=backend)
    rx = RxPipeline(spec)
    x = jax.device_put(cap)
    out = rx.rx_capture(x, max_frames=max_frames)     # compile + warmup
    jax.block_until_ready(out)
    n_ok = int(np.asarray(out["crc_ok"]).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = rx.rx_capture(x, max_frames=max_frames)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    sps = len(cap) * iters / dt
    evm = float(np.asarray(out["evm_db"])[np.asarray(out["valid"])].mean())
    return sps, n_ok, evm


def bench_cpu_reference(spec, cap, payloads):
    """Golden single-stream CPU chain samples/s (short run, extrapolated)."""
    from ofdm_uhd_tpu.golden import GoldenModem

    gm = GoldenModem(spec)
    n = min(len(cap), 5 * spec.frame_len)
    t0 = time.perf_counter()
    gm.rx_capture(cap[:n].astype(np.complex128))
    dt = time.perf_counter() - t0
    return n / dt


def main():
    from ofdm_uhd_tpu.core.spec import config
    import jax

    spec = config("c3")
    n_frames, gap = 32, 300
    cap, payloads, _ = _build_capture(spec, n_frames, gap)
    print(f"# capture: {len(cap)} samples, {n_frames} frames, "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    sps_xla, n_ok, evm = bench_tpu(spec, cap, max_frames=n_frames + 2,
                                   backend="xla")
    best, best_name = sps_xla, "xla"
    try:
        sps_pl, n_ok_pl, _ = bench_tpu(spec, cap, max_frames=n_frames + 2,
                                       backend="pallas")
        print(f"# pallas: {sps_pl/1e6:.1f} Msps (xla {sps_xla/1e6:.1f})",
              file=sys.stderr)
        if sps_pl > best and n_ok_pl == n_ok:
            best, best_name = sps_pl, "pallas"
    except Exception as e:  # pallas backend not built yet / not on TPU
        print(f"# pallas backend unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)

    cpu_sps = bench_cpu_reference(spec, cap, payloads)
    print(f"# backend={best_name} ok={n_ok}/{n_frames} evm={evm:.1f} dB "
          f"cpu_ref={cpu_sps/1e6:.3f} Msps", file=sys.stderr)

    print(json.dumps({
        "metric": "ofdm_demod_rx_chain_c3",
        "value": round(best / 1e6, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(best / cpu_sps, 1),
    }))


if __name__ == "__main__":
    main()
