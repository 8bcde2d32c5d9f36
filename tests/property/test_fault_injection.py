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
