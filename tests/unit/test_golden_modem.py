"""Golden modem / chain validation from first principles (SURVEY.md §4, M0)."""

import zlib
import numpy as np
import pytest

from ofdm_uhd_tpu.core.spec import WaveformSpec, ChannelSpec, config
from ofdm_uhd_tpu.golden import GoldenModem
from ofdm_uhd_tpu.golden import modem as M
from ofdm_uhd_tpu.golden import sync as S
from ofdm_uhd_tpu.golden import resample as R
from ofdm_uhd_tpu.channel import apply_channel, make_capture



@pytest.mark.parametrize("mod", ["bpsk", "qpsk", "qam16", "qam64", "qam256"])
def test_qam_roundtrip_and_power(mod):
    RNG = np.random.default_rng(zlib.crc32(b'test_qam_roundtrip_and_power') % 2**31)
    from ofdm_uhd_tpu.core.spec import MOD_BITS
    bits = RNG.integers(0, 2, MOD_BITS[mod] * 4096).astype(np.uint8)
    syms = M.qam_map(bits, mod)
    assert np.isclose(np.mean(np.abs(syms) ** 2), 1.0, atol=0.05)
    assert np.array_equal(M.qam_demap_hard(syms, mod), bits)
    # LLR signs agree with the bits on clean symbols (llr>0 <=> bit 0)
    llr = M.qam_demap_llr(syms, mod)
    assert np.array_equal((llr < 0).astype(np.uint8), bits)


def test_ofdm_parseval_and_grid_roundtrip():
    RNG = np.random.default_rng(zlib.crc32(b'test_ofdm_parseval_and_grid_roundtrip') % 2**31)
    spec = WaveformSpec()
    grid = (RNG.standard_normal((spec.n_syms, spec.n_sc))
            + 1j * RNG.standard_normal((spec.n_syms, spec.n_sc)))
    x = M.ofdm_modulate(spec, grid)
    assert len(x) == spec.frame_len
    # ortho IFFT preserves power (excluding the CP copies)
    body = x.reshape(spec.n_syms, spec.sym_len)[:, spec.cp:]
    assert np.isclose(np.sum(np.abs(body) ** 2), np.sum(np.abs(grid) ** 2))
    grid2 = M.ofdm_demodulate(spec, x)
    np.testing.assert_allclose(grid2, grid, atol=1e-10)


def test_preamble_sym_a_has_repeated_halves():
    RNG = np.random.default_rng(zlib.crc32(b'test_preamble_sym_a_has_repeated_halves') % 2**31)
    spec = WaveformSpec()
    sym_a, sym_b = M.preamble_freq(spec)
    t = np.fft.ifft(sym_a, norm="ortho")
    np.testing.assert_allclose(t[: spec.n_sc // 2], t[spec.n_sc // 2:], atol=1e-12)
    # both preamble symbols carry ~unit average power over the frame grid
    assert np.isclose(np.sum(np.abs(sym_a) ** 2), spec.n_occupied, rtol=0.1)
    assert np.isclose(np.sum(np.abs(sym_b) ** 2), spec.n_occupied, rtol=1e-6)


@pytest.mark.parametrize("cfg", ["c1", "c2", "c3"])
def test_loopback_noiseless_bit_exact(cfg):
    RNG = np.random.default_rng(zlib.crc32(b'test_loopback_noiseless_bit_exact') % 2**31)
    spec = config(cfg)
    modem = GoldenModem(spec)
    payloads = RNG.integers(0, 2, (3, spec.payload_bits_per_frame)).astype(np.uint8)
    frames = modem.tx(payloads)
    results = modem.rx_aligned(frames)
    for p, r in zip(payloads, results):
        assert r.crc_ok
        assert np.array_equal(r.payload, p)
        assert r.evm_db < -100  # numerically clean


def test_c1_awgn_100_frames():
    RNG = np.random.default_rng(zlib.crc32(b'test_c1_awgn_100_frames') % 2**31)
    """BASELINE.json C1: 64-SC, CP16, QPSK, 100 frames, AWGN — post-FEC exact."""
    spec = config("c1")
    modem = GoldenModem(spec)
    n = 100
    payloads = RNG.integers(0, 2, (n, spec.payload_bits_per_frame)).astype(np.uint8)
    frames = modem.tx(payloads)
    ch = ChannelSpec(snr_db=12.0)
    rx_frames = np.stack([
        apply_channel(frames[i], ch, spec.n_sc, seed=1000 + i) for i in range(n)
    ])
    results = modem.rx_aligned(rx_frames)
    ok = sum(r.crc_ok and np.array_equal(r.payload, p)
             for p, r in zip(payloads, results))
    assert ok == n


def test_c2_multipath_qam16():
    RNG = np.random.default_rng(zlib.crc32(b'test_c2_multipath_qam16') % 2**31)
    """BASELINE.json C2: 64-SC QAM-16, pilot chanest + one-tap EQ, multipath."""
    spec = config("c2")
    modem = GoldenModem(spec)
    payloads = RNG.integers(0, 2, (20, spec.payload_bits_per_frame)).astype(np.uint8)
    frames = modem.tx(payloads)
    ch = ChannelSpec(snr_db=25.0, multipath_taps=(1.0, 0.4 - 0.2j, 0.1j))
    rx = np.stack([apply_channel(frames[i], ch, spec.n_sc, seed=i)
                   for i in range(len(frames))])
    results = modem.rx_aligned(rx, shift=4)
    for p, r in zip(payloads, results):
        assert r.crc_ok and np.array_equal(r.payload, p)
        assert r.evm_db < -15


def test_schmidl_cox_timing_and_cfo():
    RNG = np.random.default_rng(zlib.crc32(b'test_schmidl_cox_timing_and_cfo') % 2**31)
    spec = config("c3")
    modem = GoldenModem(spec)
    payload = RNG.integers(0, 2, spec.payload_bits_per_frame).astype(np.uint8)
    frame = modem.modulate_frame(payload)
    true_eps = 0.37
    offset = 333
    cap = make_capture(frame[None, :],
                       ChannelSpec(snr_db=20.0, cfo=true_eps, timing_offset=offset),
                       spec.n_sc, gap=400, seed=7)
    d, eps = S.coarse_sync(spec, cap)
    assert abs(eps - true_eps) < 0.02
    # timing within the CP window (early by <= cp is recoverable)
    assert -spec.cp <= d - offset <= spec.cp // 2


def test_integer_cfo_detection():
    RNG = np.random.default_rng(zlib.crc32(b'test_integer_cfo_detection') % 2**31)
    spec = config("c3")
    modem = GoldenModem(spec)
    payload = RNG.integers(0, 2, spec.payload_bits_per_frame).astype(np.uint8)
    frame = modem.modulate_frame(payload)
    for k in (-2, 0, 3):
        true_eps = k + 0.21
        cap = make_capture(frame[None, :],
                           ChannelSpec(snr_db=20.0, cfo=true_eps),
                           spec.n_sc, gap=200, seed=11)
        d, eps_f = S.coarse_sync(spec, cap)
        d = max(d, 0)  # sync may report a few samples early at offset 0
        fr = S.cfo_correct(cap[d : d + spec.frame_len], eps_f, spec.n_sc)
        k_hat = S.integer_cfo(spec, fr)
        # fractional part folds: eps_f + k_hat should recover true_eps
        assert abs((eps_f + k_hat) - true_eps) < 0.05


def test_c3_capture_rx_end_to_end():
    RNG = np.random.default_rng(zlib.crc32(b'test_c3_capture_rx_end_to_end') % 2**31)
    """BASELINE.json C3: 256-SC QAM-64, S&C sync, CFO + phase noise capture."""
    spec = config("c3")
    modem = GoldenModem(spec)
    n = 8
    payloads = RNG.integers(0, 2, (n, spec.payload_bits_per_frame)).astype(np.uint8)
    frames = np.stack([modem.modulate_frame(p) for p in payloads])
    ch = ChannelSpec(snr_db=28.0, cfo=1.3, phase_noise_std=5e-4, timing_offset=250)
    cap = make_capture(frames, ch, spec.n_sc, gap=300, seed=3)
    results = modem.rx_capture(cap)
    assert len(results) == n
    for (d, eps, r), p in zip(results, payloads):
        assert abs(eps - 1.3) < 0.05
        assert r.crc_ok and np.array_equal(r.payload, p)


def test_resampler_roundtrip():
    RNG = np.random.default_rng(zlib.crc32(b'test_resampler_roundtrip') % 2**31)
    spec = config("c4")  # 8x
    t = np.arange(4096)
    # bandlimited test signal (well inside passband)
    x = np.exp(1j * 2 * np.pi * 0.03 * t) + 0.5 * np.exp(1j * 2 * np.pi * 0.011 * t)
    up = R.resample(x, 8, 1)
    assert len(up) == 8 * len(x)
    down = R.resample(up, 1, 8)
    # interior matches (edges have filter transients)
    np.testing.assert_allclose(down[200:-200], x[200:-200], atol=1e-3)


def test_c4_resampled_loopback():
    RNG = np.random.default_rng(zlib.crc32(b'test_c4_resampled_loopback') % 2**31)
    """BASELINE.json C4: 1024-SC frames through the 8x polyphase path."""
    spec = config("c4")
    modem = GoldenModem(spec)
    payloads = RNG.integers(0, 2, (2, spec.payload_bits_per_frame)).astype(np.uint8)
    frames = modem.tx(payloads)           # at radio rate (8x)
    assert frames.shape[1] == spec.frame_len_radio
    results = modem.rx_aligned(frames)
    for p, r in zip(payloads, results):
        assert r.crc_ok and np.array_equal(r.payload, p)


def test_awgn_qpsk_ber_matches_theory():
    RNG = np.random.default_rng(zlib.crc32(b'test_awgn_qpsk_ber_matches_theory') % 2**31)
    """Uncoded QPSK BER ~ Q(sqrt(2 Eb/N0)) within 0.5 dB (SURVEY.md §4)."""
    from scipy.special import erfc
    spec = WaveformSpec(n_sc=64, cp=16, modulation="qpsk", n_data_syms=40)
    modem = GoldenModem(spec)
    snr_db = 7.0
    rng = np.random.default_rng(5)
    nbits = 0
    nerr = 0
    for trial in range(8):
        coded = rng.integers(0, 2, spec.coded_bits_per_frame).astype(np.uint8)
        syms = M.qam_map(coded, "qpsk").reshape(spec.n_data_syms, spec.n_data_sc)
        grid = M.build_grid(spec, syms)
        x = M.ofdm_modulate(spec, grid)
        y = apply_channel(x, ChannelSpec(snr_db=snr_db), spec.n_sc, seed=trial)
        g = M.ofdm_demodulate(spec, y)
        # identity channel, known perfectly: demap the data bins directly
        # (chanest/EQ/CPE noise penalties are chain properties, not AWGN theory)
        data = g[2:, spec.data_bins]
        bits = M.qam_demap_hard(data.reshape(-1), "qpsk")
        nerr += np.sum(bits != coded)
        nbits += len(coded)
    ber = nerr / nbits
    # per-sample SNR == Es/N0; QPSK Eb/N0 = Es/N0 / 2. The frame has CP and
    # pilot/guard overhead but per-subcarrier SNR equals per-sample SNR with
    # ortho FFT and unit-power constellations on occupied bins; power is
    # concentrated on occupied bins so subcarrier SNR is boosted by N/n_occ.
    esn0 = 10 ** (snr_db / 10.0) * spec.n_sc / spec.n_occupied
    ebn0 = esn0 / 2
    ber_theory = 0.5 * erfc(np.sqrt(ebn0))
    ebn0_lo = ebn0 / 10 ** 0.05
    ebn0_hi = ebn0 * 10 ** 0.05
    lo = 0.5 * erfc(np.sqrt(ebn0_hi))
    hi = 0.5 * erfc(np.sqrt(ebn0_lo))
    assert lo * 0.8 <= ber <= hi * 1.2, (ber, ber_theory)


@pytest.mark.parametrize("kw", [
    dict(cp=-1), dict(cp=64), dict(n_sc=100), dict(n_sc=0),
    dict(n_data_syms=0), dict(tx_window=100), dict(modulation="qam7"),
    dict(fec_rate="4/5"), dict(n_occupied=63), dict(n_occupied=64),
])
def test_spec_rejects_invalid_geometry(kw):
    with pytest.raises(ValueError):
        config("c1").with_(**kw)
