"""Fault injection (SURVEY.md §5.3): the modem's fault tolerance is
re-acquisition — sample gaps, level drops and CFO steps must not take down
the receiver, and frames after the fault must decode."""

import zlib

import numpy as np

from ofdm_uhd_tpu.core.spec import ChannelSpec, config
from ofdm_uhd_tpu.channel import apply_channel
from ofdm_uhd_tpu.golden import GoldenModem
from ofdm_uhd_tpu.pipeline import RxPipeline


def _frames(spec, n, seed):
    rng = np.random.default_rng(zlib.crc32(f"fault{seed}".encode()) % 2**31)
    gm = GoldenModem(spec)
    payloads = rng.integers(0, 2, (n, spec.payload_bits_per_frame)
                            ).astype(np.uint8)
    return [gm.modulate_frame(p) for p in payloads], payloads


def test_reacquire_after_sample_gap():
    """A dead-air gap (signal loss) between frames: both sides decode."""
    spec = config("c3")
    frames, payloads = _frames(spec, 2, 1)
    stream = np.concatenate([
        np.zeros(300, complex), frames[0],
        np.zeros(3 * spec.frame_len, complex),   # long signal loss
        frames[1], np.zeros(300, complex)])
    cap = apply_channel(stream, ChannelSpec(snr_db=25.0), spec.n_sc, seed=1)
    out = RxPipeline(spec).rx_capture(cap.astype(np.complex64), max_frames=4)
    assert np.asarray(out["valid"]).sum() == 2
    assert np.asarray(out["crc_ok"])[:2].all()
    assert np.array_equal(np.asarray(out["payload"])[:2], payloads)


def test_level_drop_between_frames():
    """20 dB level drop mid-capture: the second (quiet) frame still syncs
    (the S&C metric is level-normalized)."""
    spec = config("c3")
    frames, payloads = _frames(spec, 2, 2)
    stream = np.concatenate([
        np.zeros(200, complex), frames[0], np.zeros(400, complex),
        0.1 * frames[1], np.zeros(200, complex)])
    cap = apply_channel(stream, ChannelSpec(snr_db=35.0), spec.n_sc, seed=2)
    out = RxPipeline(spec).rx_capture(cap.astype(np.complex64), max_frames=4)
    assert np.asarray(out["valid"]).sum() == 2
    assert np.asarray(out["crc_ok"])[:2].all()
    assert np.array_equal(np.asarray(out["payload"])[:2], payloads)


def test_cfo_step_between_frames():
    """Oscillator hop between frames: per-frame CFO estimation absorbs it."""
    spec = config("c3")
    frames, payloads = _frames(spec, 2, 3)
    def cfo(x, eps):
        n = np.arange(len(x))
        return x * np.exp(1j * 2 * np.pi * eps * n / spec.n_sc)
    stream = np.concatenate([
        np.zeros(200, complex), cfo(frames[0], 0.8),
        np.zeros(400, complex), cfo(frames[1], -1.7),
        np.zeros(200, complex)])
    cap = apply_channel(stream, ChannelSpec(snr_db=28.0), spec.n_sc, seed=3)
    out = RxPipeline(spec).rx_capture(cap.astype(np.complex64), max_frames=4)
    assert np.asarray(out["valid"]).sum() == 2
    assert np.asarray(out["crc_ok"])[:2].all()
    assert np.array_equal(np.asarray(out["payload"])[:2], payloads)
    eps = np.asarray(out["eps"])[:2]
    assert abs(eps[0] - 0.8) < 0.05 and abs(eps[1] + 1.7) < 0.05


def test_corrupted_frame_flagged_not_fatal():
    """A frame destroyed mid-air is CRC-flagged; neighbours decode clean."""
    spec = config("c3")
    frames, payloads = _frames(spec, 3, 4)
    f1 = frames[1].copy()
    f1[spec.sym_len * 3 : spec.sym_len * 9] = 0  # burst puncture
    stream = np.concatenate([
        np.zeros(200, complex), frames[0], np.zeros(300, complex),
        f1, np.zeros(300, complex), frames[2], np.zeros(200, complex)])
    cap = apply_channel(stream, ChannelSpec(snr_db=30.0), spec.n_sc, seed=4)
    out = RxPipeline(spec).rx_capture(cap.astype(np.complex64), max_frames=5)
    valid = np.asarray(out["valid"])
    crc = np.asarray(out["crc_ok"])
    assert valid.sum() == 3
    assert crc[0] and crc[2]
    assert not crc[1]                  # flagged, not false-accepted
    assert np.array_equal(np.asarray(out["payload"])[0], payloads[0])
    assert np.array_equal(np.asarray(out["payload"])[2], payloads[2])


def test_track_mode_rescues_preamble_burst():
    """TRACK mode (SURVEY.md §5.3 ACQUIRE->TRACK; VERDICT r1 item 5): a
    noise burst wipes one frame's channel-estimation symbol (preamble sym
    B). Its own LS estimate is noise-dominated, so the first-pass decode
    fails CRC; the retry with the pod-tracked EMA channel + CFO (psum'd
    from earlier frames over the static channel) recovers it. Without
    track_mode the frame is lost. sfo_track absorbs the (sample-level)
    timing-phase mismatch between the tracked estimate and this frame."""
    import jax
    from ofdm_uhd_tpu.channel import make_capture
    from ofdm_uhd_tpu.pipeline.stream import StreamRx
    from ofdm_uhd_tpu.shard.mesh import make_mesh

    spec = config("c5").with_(sfo_track=True)
    n_fr, gap, offset = 10, 500, 700
    frames, payloads = _frames(spec, n_fr, seed=7)
    ch = ChannelSpec(snr_db=24.0, cfo=0.7, phase_noise_std=1e-4,
                     multipath_taps=(1.0, 0.0, 0.25j, 0.1),
                     timing_offset=offset)
    cap = make_capture(np.stack(frames), ch, spec.n_sc, gap=gap,
                       seed=7).astype(np.complex64)

    # burst over sym B of the LAST frame (well past the first chunk, so
    # the tracker has history when its chunk is processed)
    burst_frame = n_fr - 1
    s = offset + burst_frame * (spec.frame_len + gap) + spec.sym_len
    rng = np.random.default_rng(99)
    rms = float(np.sqrt(np.mean(np.abs(cap) ** 2)))
    burst = 4.0 * rms * (rng.standard_normal(spec.sym_len)
                         + 1j * rng.standard_normal(spec.sym_len))
    cap[s: s + spec.sym_len] += burst.astype(np.complex64)

    chunk = 4 * 2 * (spec.frame_len + spec.n_sc)
    assert s > chunk, "burst frame must land after the first chunk"

    def run(track):
        rx = StreamRx(spec, mesh=make_mesh(1, 4,
                                           devices=jax.devices()[:4]),
                      chunk_len=chunk, track_mode=track)
        got = rx.process(cap) + rx.flush()
        return rx, got

    rx_no, got_no = run(False)
    ok_no = sum(g.crc_ok for g in got_no)
    rx_tr, got_tr = run(True)
    ok_tr = sum(g.crc_ok for g in got_tr)

    assert ok_no == n_fr - 1, f"burst should kill exactly one frame ({ok_no})"
    assert ok_tr == n_fr, f"TRACK mode should rescue it ({ok_tr}/{n_fr})"
    assert rx_tr.rescued >= 1
    t = rx_tr.tracking()
    assert t["track_wt"] > 0 and abs(t["eps_track"] - 0.7) < 0.1
    # the rescued payload is the transmitted one
    by_start = {g.start: g for g in got_tr}
    rescued = [g for g in got_tr
               if abs(g.start - (s - spec.sym_len)) <= spec.cp]
    assert len(rescued) == 1 and rescued[0].crc_ok
    assert np.array_equal(rescued[0].payload, payloads[burst_frame])


def test_agc_extreme_levels_capture():
    """Front-end AGC (SURVEY.md §2.1 #20): captures at raw-sc16 scale
    (x3000) and heavy attenuation (x0.001) decode identically to unit
    scale with the same threshold — the AGC lands every input in one
    power regime before sync/CSI."""
    spec = config("c3")
    frames, payloads = _frames(spec, 2, 5)
    stream = np.concatenate([np.zeros(300, complex), frames[0],
                             np.zeros(500, complex), frames[1],
                             np.zeros(300, complex)])
    cap = apply_channel(stream, ChannelSpec(snr_db=25.0), spec.n_sc, seed=5)
    rx = RxPipeline(spec)
    for scale in (1.0, 3000.0, 1e-3):
        out = rx.rx_capture((cap * scale).astype(np.complex64), max_frames=4)
        assert np.asarray(out["crc_ok"])[:2].all(), scale
        assert np.array_equal(np.asarray(out["payload"])[:2], payloads), scale


def test_agc_level_drop_stream():
    """A 20 dB level drop mid-stream (transmitter power step): frames on
    both sides decode; the per-window AGC keeps the tracked channel
    magnitudes comparable so TRACK-mode state stays sane across the step."""
    import jax
    from ofdm_uhd_tpu.channel import make_capture
    from ofdm_uhd_tpu.pipeline.stream import StreamRx
    from ofdm_uhd_tpu.shard.mesh import make_mesh

    spec = config("c5")
    n_fr, gap, offset = 8, 500, 700
    frames, payloads = _frames(spec, n_fr, seed=11)
    ch = ChannelSpec(snr_db=26.0, cfo=0.4, timing_offset=offset)
    cap = make_capture(np.stack(frames), ch, spec.n_sc, gap=gap,
                       seed=11).astype(np.complex64)
    # drop to 0.1x from frame 4 onward (between frames, not mid-frame)
    cut = offset + 4 * (spec.frame_len + gap) - gap // 2
    cap[cut:] *= np.float32(0.1)

    chunk = 4 * 2 * (spec.frame_len + spec.n_sc)
    rx = StreamRx(spec, mesh=make_mesh(1, 4, devices=jax.devices()[:4]),
                  chunk_len=chunk)
    got = rx.process(cap) + rx.flush()
    assert len(got) == n_fr
    for g, p in zip(got, payloads):
        assert g.crc_ok
        assert np.array_equal(g.payload, p)
