"""Consolidated TPU bench/validation session — ONE process, staged, stops
at the first failure (a failed compile can wedge the axon backend server,
poisoning every op after; see docs/ARCHITECTURE.md quirk log).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_session.py 2>tpu_session.log
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

RESULTS = {}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def stage(name, fn, fatal=True):
    t0 = time.time()
    try:
        out = fn()
        jax.block_until_ready(out)
        log(f"[{time.time()-t0:7.1f}s] {name}: OK")
        return out
    except Exception as e:
        log(f"[{time.time()-t0:7.1f}s] {name}: FAIL {type(e).__name__} "
            f"{str(e)[:140]}")
        if fatal:
            log("stopping session to avoid wedging the backend")
            dump()
            sys.exit(1)
        return None


def timeit(name, fn, iters=10, payload_samples=None):
    fn()  # warm
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn()
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / iters
    msg = f"    {name}: {dt*1e3:.2f} ms/iter"
    if payload_samples:
        msps = payload_samples / dt / 1e6
        msg += f" = {msps:,.0f} Msamples/s"
        RESULTS[name] = round(msps, 1)
    log(msg)
    return dt


def dump():
    log("RESULTS " + json.dumps(RESULTS))


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)

    # 1. sanity
    stage("sanity", lambda: jnp.arange(16.0).sum())

    # NOTE: never run raw-complex-signature executables here — even when
    # one "succeeds" it can poison the axon server for the next complex-
    # adjacent executable (observed: tpu_session4.log's tx-fetch failure
    # right after a passing raw_complex_arg stage; the identical planar tx
    # graph passes in a clean process, scripts/tpu_bisect_tx2.py).
    big_1d_ok = True

    from ofdm_uhd_tpu.core.spec import config, ChannelSpec
    from ofdm_uhd_tpu.channel import apply_channel, make_capture
    from ofdm_uhd_tpu.golden import GoldenModem
    from ofdm_uhd_tpu.pipeline import TxPipeline, RxPipeline

    # 3-5. aligned pipelines
    for cfg, nfr in (("c1", 32), ("c2", 32), ("c3", 32)):
        spec = config(cfg)
        p = rng.integers(0, 2, (nfr, spec.payload_bits_per_frame)
                         ).astype(np.uint8)
        tx = TxPipeline(spec)
        frames = stage(f"{cfg} tx[{nfr}]", lambda: tx(p))
        # axon quirk: complex64 device->host copies are UNIMPLEMENTED;
        # fetch via stacked f32 planes (core.platform.fetch)
        from ofdm_uhd_tpu.core.platform import fetch
        frames_h = stage(f"{cfg} tx fetch", lambda: fetch(frames))
        ch = ChannelSpec(snr_db=25.0)
        from ofdm_uhd_tpu.core.boundary import device_put_planar
        rx_in = device_put_planar(np.stack([
            apply_channel(frames_h[i], ch, spec.n_sc, seed=i)
            for i in range(nfr)]).astype(np.complex64))
        rx = RxPipeline(spec)
        out = stage(f"{cfg} rx_aligned[{nfr}]", lambda: rx.rx_aligned(rx_in))
        ok = int(np.asarray(out["crc_ok"]).sum())
        log(f"    crc {ok}/{nfr}")
        n_samp = (rx_in.pair[0].size if hasattr(rx_in, "pair")
                  else rx_in.size)
        timeit(f"{cfg}_aligned_msps", lambda: rx.rx_aligned(rx_in),
               payload_samples=n_samp)

    # 6. FFT kernels: pallas vs xla (planar-boundary wrapped — axon
    # cannot pass complex across executables, core/boundary.py)
    from ofdm_uhd_tpu.core import boundary as BD
    from ofdm_uhd_tpu.kernels.pallas_fft import fft_pallas

    def planar_jit(fn):
        return jax.jit(BD.planarize(fn))

    for n, b in ((64, 2048), (256, 1024), (1024, 256)):
        x = (rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
             ).astype(np.complex64)
        xj = jax.device_put(BD.encode_host(x))
        f_x = planar_jit(lambda v: jnp.fft.fft(v, norm="ortho"))
        f_p = planar_jit(lambda v: fft_pallas(v))
        ref = stage(f"fft_xla[{b}x{n}]", lambda: f_x(xj))
        got = stage(f"fft_pallas[{b}x{n}]", lambda: f_p(xj), fatal=False)
        if got is not None:
            err = float(jnp.max(jnp.abs(got.pair - ref.pair)))
            log(f"    maxerr {err:.2e}")
            t_x = timeit(f"fft{n}_xla", lambda: f_x(xj))
            t_p = timeit(f"fft{n}_pallas", lambda: f_p(xj))
            RESULTS[f"fft{n}_speedup"] = round(t_x / t_p, 2)

    # 7. FIR kernels
    from ofdm_uhd_tpu.kernels import conv_backend as CB
    from ofdm_uhd_tpu.kernels.pallas_fir import fir_pallas, polyphase_interp_pallas
    from ofdm_uhd_tpu.golden.resample import design_lowpass
    taps = design_lowpass(8, 1).astype(np.float32)
    x = (rng.standard_normal((16, 8192)) + 1j * rng.standard_normal((16, 8192))
         ).astype(np.complex64)
    xj = jax.device_put(BD.encode_host(x))
    f_cx = planar_jit(lambda v: CB.fir_same(v, taps))
    f_cp = planar_jit(lambda v: fir_pallas(v, taps))
    ref = stage("fir_xla[16x8192]", lambda: f_cx(xj))
    got = stage("fir_pallas[16x8192]", lambda: f_cp(xj), fatal=False)
    if got is not None:
        log(f"    maxerr {float(jnp.max(jnp.abs(got.pair-ref.pair))):.2e}")
        t_x = timeit("fir_xla", lambda: f_cx(xj))
        t_p = timeit("fir_pallas", lambda: f_cp(xj))
        RESULTS["fir_speedup"] = round(t_x / t_p, 2)
    f_ix = planar_jit(lambda v: CB.polyphase_interp_xla(v, 8, taps))
    f_ip = planar_jit(lambda v: polyphase_interp_pallas(v, 8, taps))
    ref = stage("interp_xla", lambda: f_ix(xj))
    got = stage("interp_pallas", lambda: f_ip(xj), fatal=False)
    if got is not None:
        log(f"    maxerr {float(jnp.max(jnp.abs(got.pair-ref.pair))):.2e}")
        t_x = timeit("interp8_xla", lambda: f_ix(xj))
        t_p = timeit("interp8_pallas", lambda: f_ip(xj))
        RESULTS["interp_speedup"] = round(t_x / t_p, 2)

    # 8-10. capture + streaming paths (only if big 1-D works)
    if big_1d_ok:
        spec = config("c3")
        gm = GoldenModem(spec)
        p = rng.integers(0, 2, (8, spec.payload_bits_per_frame)).astype(np.uint8)
        fr = np.stack([gm.modulate_frame(pp) for pp in p])
        cap = make_capture(fr, ChannelSpec(snr_db=28.0, cfo=0.8,
                                           timing_offset=100),
                           spec.n_sc, gap=300, seed=1).astype(np.complex64)
        capj = BD.device_put_planar(cap)
        for backend in ("xla", "pallas"):
            rxc = RxPipeline(spec.with_(kernel_backend=backend))
            out = stage(f"c3 capture[{len(cap)}] {backend}",
                        lambda: rxc.rx_capture(capj, max_frames=10),
                        fatal=(backend == "xla"))
            if out is None:
                continue
            ok = int(np.asarray(out["crc_ok"]).sum())
            log(f"    crc {ok}/8, bits exact: "
                f"{np.array_equal(np.asarray(out['payload'])[:8], p)}")
            timeit(f"c3_capture_{backend}_msps",
                   lambda: rxc.rx_capture(capj, max_frames=10),
                   payload_samples=len(cap))

        # streaming single-device
        from ofdm_uhd_tpu.pipeline.stream import StreamRx
        from ofdm_uhd_tpu.shard.mesh import make_mesh
        spec5 = config("c5")
        gm5 = GoldenModem(spec5)
        p5 = rng.integers(0, 2, (6, spec5.payload_bits_per_frame)).astype(np.uint8)
        fr5 = np.stack([gm5.modulate_frame(pp) for pp in p5])
        cap5 = make_capture(fr5, ChannelSpec(snr_db=26.0, cfo=0.4),
                            spec5.n_sc, gap=400, seed=2).astype(np.complex64)
        rxs = StreamRx(spec5, mesh=make_mesh(1, 1))
        def run_stream():
            rxs.state = type(rxs.state).init(spec5)
            return rxs.process(np.concatenate([cap5, np.zeros(
                (-len(cap5)) % rxs.chunk_len + rxs.chunk_len, np.complex64)]))
        got = stage("c5 stream 1dev", run_stream)
        if got is not None:
            log(f"    frames {len(got)}/6 ok={all(g.crc_ok for g in got)}")

    dump()


if __name__ == "__main__":
    main()
