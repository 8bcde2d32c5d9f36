"""End-to-end JAX pipeline tests for acceptance configs C1-C4 (CPU/XLA).

The sharded (C4/C5) variants live in tests/distributed/.
"""

import zlib

import numpy as np
import pytest

from ofdm_uhd_tpu.core.spec import ChannelSpec, config
from ofdm_uhd_tpu.channel import apply_channel, make_capture
from ofdm_uhd_tpu.golden import GoldenModem
from ofdm_uhd_tpu.pipeline import TxPipeline, RxPipeline


def rng_for(name):
    return np.random.default_rng(zlib.crc32(name.encode()) % 2**31)


def payloads_for(spec, n, r):
    return r.integers(0, 2, (n, spec.payload_bits_per_frame)).astype(np.uint8)


def test_tx_matches_golden():
    r = rng_for("txg")
    for cfg in ("c1", "c2", "c3"):
        spec = config(cfg)
        p = payloads_for(spec, 2, r)
        jax_frames = np.asarray(TxPipeline(spec)(p))
        gold_frames = GoldenModem(spec).tx(p)
        np.testing.assert_allclose(jax_frames, gold_frames, atol=2e-5)


def test_c1_loopback_bit_exact_vs_golden():
    """BASELINE.json C1: 100 QPSK frames over AWGN — post-FEC bit-exact,
    JAX chain agrees with the golden CPU reference."""
    spec = config("c1")
    r = rng_for("c1pipe")
    p = payloads_for(spec, 100, r)
    tx = TxPipeline(spec)
    frames = np.asarray(tx(p))
    ch = ChannelSpec(snr_db=12.0)
    rx_in = np.stack([apply_channel(frames[i], ch, spec.n_sc, seed=50 + i)
                      for i in range(100)])
    out = RxPipeline(spec).rx_aligned(rx_in)
    assert np.asarray(out["crc_ok"]).all()
    assert np.array_equal(np.asarray(out["payload"]), p)
    # golden on the same capture decodes identically
    gold = GoldenModem(spec).rx_aligned(rx_in)
    assert all(g.crc_ok and np.array_equal(g.payload, pp)
               for g, pp in zip(gold, p))


def test_c2_multipath_qam16():
    spec = config("c2")
    r = rng_for("c2pipe")
    p = payloads_for(spec, 16, r)
    frames = np.asarray(TxPipeline(spec)(p))
    ch = ChannelSpec(snr_db=25.0, multipath_taps=(1.0, 0.4 - 0.2j, 0.1j))
    rx_in = np.stack([apply_channel(frames[i], ch, spec.n_sc, seed=i)
                      for i in range(len(p))])
    out = RxPipeline(spec, shift=4).rx_aligned(rx_in)
    assert np.asarray(out["crc_ok"]).all()
    assert np.array_equal(np.asarray(out["payload"]), p)
    assert np.asarray(out["evm_db"]).mean() < -15


def test_c3_capture_sync_rx():
    """BASELINE.json C3: 256-SC QAM-64 capture with CFO + phase noise —
    fixed-capacity jitted detection matches golden's detections."""
    spec = config("c3")
    r = rng_for("c3pipe")
    n = 6
    p = payloads_for(spec, n, r)
    gm = GoldenModem(spec)
    frames = np.stack([gm.modulate_frame(x) for x in p])
    ch = ChannelSpec(snr_db=28.0, cfo=1.3, phase_noise_std=5e-4,
                     timing_offset=400)
    cap = make_capture(frames, ch, spec.n_sc, gap=300, seed=9)
    out = RxPipeline(spec).rx_capture(cap.astype(np.complex64), max_frames=8)
    valid = np.asarray(out["valid"])
    assert valid.sum() == n
    assert np.asarray(out["crc_ok"])[: n].all()
    assert np.array_equal(np.asarray(out["payload"])[:n], p)
    np.testing.assert_allclose(np.asarray(out["eps"])[:n], 1.3, atol=0.05)
    # same frames as golden finds
    gold = gm.rx_capture(cap)
    gd = np.array([d for d, _, _ in gold])
    np.testing.assert_allclose(np.asarray(out["d"])[:n], gd, atol=spec.cp)


def test_c4_resample_loopback():
    """BASELINE.json C4: 1024-SC + 8x polyphase, aligned loopback."""
    spec = config("c4")
    r = rng_for("c4pipe")
    p = payloads_for(spec, 2, r)
    frames = np.asarray(TxPipeline(spec)(p))
    assert frames.shape[1] == spec.frame_len_radio
    ch = ChannelSpec(snr_db=30.0)
    rx_in = np.stack([apply_channel(frames[i], ch, spec.n_sc, seed=i)
                      for i in range(len(p))])
    out = RxPipeline(spec).rx_aligned(rx_in)
    assert np.asarray(out["crc_ok"]).all()
    assert np.array_equal(np.asarray(out["payload"]), p)


def test_capture_rx_near_back_to_back_frames():
    """Frames separated by a gap SMALLER than the detection anchor jitter
    (gap < sym_len): the greedy candidate selector must not skip alternate
    frames. Regression for the C4 8x-decimation bench (radio gap 300 -> 37
    baseband samples < the ~cp/2 anchor overshoot), where the rising-edge
    form without eligibility slack dropped every other frame."""
    spec = config("c2")
    r = rng_for("b2b")
    n = 8
    p = payloads_for(spec, n, r)
    gm = GoldenModem(spec)
    frames = np.stack([gm.modulate_frame(x) for x in p])
    ch = ChannelSpec(snr_db=28.0, cfo=0.2, timing_offset=50)
    cap = make_capture(frames, ch, spec.n_sc, gap=8, seed=3)
    out = RxPipeline(spec).rx_capture(cap.astype(np.complex64),
                                      max_frames=n + 2)
    assert int(np.asarray(out["valid"]).sum()) == n
    assert np.asarray(out["crc_ok"])[:n].all()
    assert np.array_equal(np.asarray(out["payload"])[:n], p)


def test_capture_rx_noise_only_no_false_detects():
    spec = config("c3")
    r = rng_for("noise")
    noise = (r.standard_normal(30000) + 1j * r.standard_normal(30000)
             ).astype(np.complex64)
    out = RxPipeline(spec).rx_capture(noise, max_frames=4)
    assert not np.asarray(out["valid"]).any()
    assert not np.asarray(out["crc_ok"]).any()


def test_qam256_loopback_bit_exact():
    """256-QAM end-to-end (dense constellation needs ~35+ dB SNR): TX ->
    AWGN + multipath -> aligned RX, post-FEC bit-exact, JAX == golden."""
    spec = config("c2").with_(modulation="qam256")
    r = rng_for("q256")
    p = payloads_for(spec, 12, r)
    frames = np.asarray(TxPipeline(spec)(p))
    ch = ChannelSpec(snr_db=40.0, multipath_taps=(1.0, 0.08 + 0.05j))
    rx_in = np.stack([apply_channel(frames[i], ch, spec.n_sc, seed=90 + i)
                      for i in range(12)])
    out = RxPipeline(spec, shift=min(4, spec.cp // 4)).rx_aligned(rx_in)
    assert np.asarray(out["crc_ok"]).all()
    assert np.array_equal(np.asarray(out["payload"]), p)
    gold = GoldenModem(spec).rx_aligned(rx_in)
    assert all(g.crc_ok for g in gold)
    assert np.array_equal(np.stack([g.payload for g in gold]),
                          np.asarray(out["payload"]))


def test_rx_capture_sc16_matches_fc32():
    """Radio-native sc16 int16 IQ input (UHD wire format, on-device
    conversion) decodes the same frames as the fc32 path; quantization at
    full scale is ~-90 dB, far below channel noise."""
    import numpy as np
    from ofdm_uhd_tpu.core.spec import config, ChannelSpec
    from ofdm_uhd_tpu.channel import make_capture
    from ofdm_uhd_tpu.golden import GoldenModem
    from ofdm_uhd_tpu.pipeline import RxPipeline

    spec = config("c3")
    rng = np.random.default_rng(17)
    gm = GoldenModem(spec)
    pays = rng.integers(0, 2, (4, spec.payload_bits_per_frame)).astype(np.uint8)
    frames = np.stack([gm.modulate_frame(p) for p in pays])
    ch = ChannelSpec(snr_db=26.0, cfo=0.6, timing_offset=200)
    cap = make_capture(frames, ch, spec.n_sc, gap=400,
                       seed=17).astype(np.complex64)
    planes = np.stack([cap.real, cap.imag])
    iq = np.round(planes * (32767.0 / np.max(np.abs(planes)))).astype(np.int16)

    rx = RxPipeline(spec, diag=False)
    o16 = rx.rx_capture_sc16(iq, max_frames=6)
    o32 = rx.rx_capture(cap, max_frames=6)
    for o in (o16, o32):
        assert np.asarray(o["crc_ok"])[:4].all()
        assert np.array_equal(np.asarray(o["payload"])[:4], pays)
    # batched [2, C, n] form
    iq2 = np.stack([iq, iq], axis=1)          # [2, 2, n]
    ob = rx.rx_capture_sc16(iq2, max_frames=6)
    assert np.asarray(ob["crc_ok"])[:, :4].all()
