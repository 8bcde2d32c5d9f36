"""Pallas kernels vs XLA backends vs golden NumPy (SURVEY.md §4 kernel tier).

On CPU these run in interpret mode (pl.pallas_call(interpret=True)); the
same tests execute compiled on TPU when available. Property tests (Parseval,
linearity, impulse response) validate the kernels from first principles.
"""

import zlib

import numpy as np
import pytest

from ofdm_uhd_tpu.golden import resample as GR
from ofdm_uhd_tpu.kernels import conv_backend as CB
from ofdm_uhd_tpu.kernels.pallas_fft import fft_pallas
from ofdm_uhd_tpu.kernels.pallas_fir import (fir_pallas,
                                             polyphase_interp_pallas,
                                             polyphase_decim_pallas)
from ofdm_uhd_tpu.kernels.pallas_sync import sc_correlate_pallas
from ofdm_uhd_tpu.kernels.sync import sc_correlate


def rng_for(name):
    return np.random.default_rng(zlib.crc32(name.encode()) % 2**31)


def crand(r, *shape):
    return (r.standard_normal(shape) + 1j * r.standard_normal(shape)
            ).astype(np.complex64)


@pytest.mark.parametrize("n", [64, 256, 1024])
def test_pallas_fft_matches_numpy(n):
    r = rng_for(f"fft{n}")
    x = crand(r, 5, n)  # odd batch exercises padding
    y = np.asarray(fft_pallas(x))
    ref = np.fft.fft(x, norm="ortho", axis=-1)
    np.testing.assert_allclose(y, ref, atol=2e-4 * np.sqrt(n))
    yi = np.asarray(fft_pallas(x, inverse=True))
    refi = np.fft.ifft(x, norm="ortho", axis=-1)
    np.testing.assert_allclose(yi, refi, atol=2e-4 * np.sqrt(n))


@pytest.mark.parametrize("n,cp", [(64, 16), (256, 32), (512, 64)])
def test_pallas_fused_cp_fft(n, cp):
    """CP-strip-FFT and IFFT-CP fused into the DFT matrix must match the
    slice+fft / ifft+concat forms (kernels/pallas_fft._build_fused)."""
    from ofdm_uhd_tpu.kernels.pallas_fft import (cp_strip_fft_pallas,
                                                 ifft_cp_pallas)
    r = rng_for(f"cpfft{n}")
    sl = n + cp
    x = crand(r, 3, 14, sl)
    start = cp - min(4, cp // 4)
    y = np.asarray(cp_strip_fft_pallas(x, start, n))
    ref = np.fft.fft(x[..., start:start + n], norm="ortho", axis=-1)
    np.testing.assert_allclose(y, ref, atol=2e-4 * np.sqrt(n))
    g = crand(r, 3, 14, n)
    yc = np.asarray(ifft_cp_pallas(g, cp))
    xi = np.fft.ifft(g, norm="ortho", axis=-1)
    refc = np.concatenate([xi[..., -cp:], xi], axis=-1)
    np.testing.assert_allclose(yc, refc, atol=2e-4 * np.sqrt(n))


def test_pallas_fft_parseval_and_linearity():
    r = rng_for("fftprop")
    x = crand(r, 3, 256)
    y = np.asarray(fft_pallas(x))
    np.testing.assert_allclose(np.sum(np.abs(y) ** 2, axis=-1),
                               np.sum(np.abs(x) ** 2, axis=-1), rtol=1e-4)
    a, b = crand(r, 1, 256), crand(r, 1, 256)
    np.testing.assert_allclose(
        np.asarray(fft_pallas(a + 2 * b)),
        np.asarray(fft_pallas(a)) + 2 * np.asarray(fft_pallas(b)), atol=1e-3)


def test_pallas_fft_impulse():
    # FFT of a unit impulse = constant 1/sqrt(N)
    x = np.zeros((1, 1024), dtype=np.complex64)
    x[0, 0] = 1.0
    y = np.asarray(fft_pallas(x))
    np.testing.assert_allclose(y, np.full((1, 1024), 1 / 32, dtype=complex),
                               atol=1e-5)


def test_pallas_fir_matches_golden_and_xla():
    r = rng_for("fir")
    taps = GR.design_lowpass(4, 1).astype(np.float32)  # 97 taps
    x = crand(r, 3, 1000)  # non-multiple of block exercises padding
    y_pl = np.asarray(fir_pallas(x, taps))
    y_xla = np.asarray(CB.fir_same(x, taps))
    np.testing.assert_allclose(y_pl, y_xla, atol=1e-4)
    y_gold = np.stack([GR.fir_filter(row.astype(np.complex128),
                                     taps.astype(np.float64)) for row in x])
    np.testing.assert_allclose(y_pl, y_gold, atol=1e-3)


def test_pallas_fir_impulse_response():
    taps = np.arange(1, 12, dtype=np.float32)
    x = np.zeros((1, 300), dtype=np.complex64)
    x[0, 100] = 1.0
    y = np.asarray(fir_pallas(x, taps))
    half = (len(taps) - 1) // 2
    expect = np.zeros(300)
    expect[100 - half : 100 - half + len(taps)] = taps
    np.testing.assert_allclose(y[0].real, expect, atol=1e-5)


@pytest.mark.parametrize("l", [2, 8])
def test_pallas_polyphase_interp_matches_xla_and_golden(l):
    r = rng_for(f"interp{l}")
    taps = GR.design_lowpass(l, 1)
    x = crand(r, 2, 700)
    y_pl = np.asarray(polyphase_interp_pallas(x, l, taps))
    y_xla = np.asarray(CB.polyphase_interp_xla(x, l, taps))
    np.testing.assert_allclose(y_pl, y_xla, atol=1e-4)
    y_gold = np.stack([GR.resample(row.astype(np.complex128), l, 1,
                                   taps.astype(np.float64)) for row in x])
    np.testing.assert_allclose(y_pl, y_gold, atol=1e-3)


def test_pallas_polyphase_decim_matches_xla():
    r = rng_for("decim")
    m = 8
    taps = GR.design_lowpass(m, 1)
    x = crand(r, 2, 4096)
    y_pl = np.asarray(polyphase_decim_pallas(x, m, taps))
    y_xla = np.asarray(CB.polyphase_decim_xla(x, m, taps))
    np.testing.assert_allclose(y_pl, y_xla, atol=1e-4)


def test_pallas_sync_matches_xla_and_golden():
    from ofdm_uhd_tpu.core.spec import config
    from ofdm_uhd_tpu.golden import sync as GS
    r = rng_for("sync")
    spec = config("c3")
    x = crand(r, 3000)
    p_pl, rr_pl = sc_correlate_pallas(x, spec.n_sc // 2)
    p_x, rr_x = sc_correlate(x, spec.n_sc // 2, backend="xla")
    np.testing.assert_allclose(np.asarray(p_pl), np.asarray(p_x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(rr_pl), np.asarray(rr_x), atol=1e-3)
    p_g, rr_g = GS.sc_metric(spec, x.astype(np.complex128))
    np.testing.assert_allclose(np.asarray(p_pl), p_g, atol=1e-2)
    np.testing.assert_allclose(np.asarray(rr_pl), rr_g, atol=1e-2)


def test_pallas_viterbi_matches_scan_and_golden():
    from ofdm_uhd_tpu.golden import bits as GB
    from ofdm_uhd_tpu.phy import bits as PB
    from ofdm_uhd_tpu.kernels.pallas_viterbi import viterbi_pallas
    r = rng_for("pvit")
    n = 561  # odd length, exercises non-multiple sizes
    msgs = r.integers(0, 2, (5, n)).astype(np.uint8)  # odd batch too
    llrs = []
    for m in msgs:
        coded = GB.conv_encode(np.concatenate([m, np.zeros(6, np.uint8)]))
        llrs.append((1.0 - 2.0 * coded) + 0.6 * r.standard_normal(len(coded)))
    llrs = np.stack(llrs).astype(np.float32)
    out_pl = np.asarray(viterbi_pallas(llrs))
    out_scan = np.asarray(PB.viterbi_decode(llrs))
    assert np.array_equal(out_pl, out_scan)
    out_gold = np.stack([GB.viterbi_decode(l.astype(np.float64))
                         for l in llrs])
    assert np.array_equal(out_pl, out_gold)
    # and all decode the true messages
    assert np.array_equal(out_pl[:, :n], msgs)
