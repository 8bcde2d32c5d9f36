"""Equality of the row-major MXU banded tier (pallas_fir_mxu) vs
conv_backend — interpret mode on CPU; on-chip A/B in bench/kernels_ab.py."""

import numpy as np
import pytest

from ofdm_uhd_tpu.kernels import conv_backend as CB
from ofdm_uhd_tpu.kernels import pallas_fir_mxu as PM
from ofdm_uhd_tpu.phy.tables import resample_filter

rng = np.random.default_rng(11)


def _sig(shape):
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)
            ).astype(np.complex64)


@pytest.mark.parametrize("shape", [(5000,), (3, 4500)])
def test_fir_mxu_matches_xla(shape):
    taps = np.asarray(resample_filter(8, 1))
    x = _sig(shape)
    ref = np.asarray(CB.fir_same(x, taps))
    got = np.asarray(PM.fir_mxu_pallas(x, taps))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_fir_mxu_short_taps():
    taps = np.asarray([0.25, 0.5, 0.25], np.float32)
    x = _sig((2, 1000))
    np.testing.assert_allclose(np.asarray(PM.fir_mxu_pallas(x, taps)),
                               np.asarray(CB.fir_same(x, taps)), atol=1e-6)


@pytest.mark.parametrize("m,n", [(8, 40960), (2, 9000)])
def test_decim_mxu_matches_xla(m, n):
    taps = np.asarray(resample_filter(m, 1))
    x = _sig((n,))
    ref = np.asarray(CB.polyphase_decim_xla(x, m, taps))
    got = np.asarray(PM.polyphase_decim_mxu_pallas(x, m, taps))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("l,n", [(8, 5120), (2, 3000)])
def test_interp_mxu_matches_xla(l, n):
    taps = np.asarray(resample_filter(l, 1))
    x = _sig((n,))
    ref = np.asarray(CB.polyphase_interp_xla(x, l, taps))
    got = np.asarray(PM.polyphase_interp_mxu_pallas(x, l, taps))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_fir_mxu_long_taps_autoscale():
    """Filters longer than the default block must scale blk up instead of
    asserting (ADVICE r4: 'auto' routes every size>=64 fir to this tier)."""
    from ofdm_uhd_tpu.kernels import fir as K2
    t = np.hanning(385).astype(np.float32)
    taps = t / t.sum()
    x = _sig((2000,))
    ref = np.asarray(CB.fir_same(x, taps))
    got = np.asarray(PM.fir_mxu_pallas(x, taps))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    # and through the dispatcher under backend='auto'
    got_auto = np.asarray(K2.fir_filter(x, taps, backend="auto"))
    np.testing.assert_allclose(got_auto, ref, atol=2e-5)


def test_decim_mxu_long_taps_autoscale():
    t = np.hanning(1200).astype(np.float32)
    taps = t / t.sum()
    x = _sig((9600,))
    ref = np.asarray(CB.polyphase_decim_xla(x, 8, taps))
    got = np.asarray(PM.polyphase_decim_mxu_pallas(x, 8, taps))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_filter_precision_gate_chain():
    """spec.filter_precision routes the MXU tier's precision: 'exact' is
    bit-level vs conv_backend; 'high'/'bf16' stay EVM-grade through the
    resampled C4 chain (CRC still passes, EVM within 0.5 dB)."""
    import numpy as np
    from ofdm_uhd_tpu.core.spec import config
    from ofdm_uhd_tpu.pipeline import TxPipeline, RxPipeline
    spec = config("c4").with_(n_data_syms=4, kernel_backend="pallas")
    r = np.random.default_rng(8)
    p = r.integers(0, 2, (2, spec.payload_bits_per_frame)).astype(np.uint8)
    fx = np.asarray(TxPipeline(spec)(p))
    base = RxPipeline(spec).rx_aligned(fx)
    evm0 = float(np.mean(np.asarray(base["evm_db"])))
    for prec in ("bf16",):
        sp = spec.with_(filter_precision=prec)
        out = RxPipeline(sp).rx_aligned(np.asarray(TxPipeline(sp)(p)))
        assert np.asarray(out["crc_ok"]).all(), prec
        assert np.array_equal(np.asarray(out["payload"]), p), prec
        evm = float(np.mean(np.asarray(out["evm_db"])))
        assert evm < -25.0, (prec, evm)   # still EVM-grade
    assert evm0 < -30.0


def test_fir_mxu_batched_high_precision():
    taps = np.asarray(resample_filter(8, 1))
    x = _sig((4, 20000))
    import jax
    ref = np.asarray(CB.fir_same(x, taps))
    got = np.asarray(PM.fir_mxu_pallas(x, taps,
                                       precision=jax.lax.Precision.HIGH))
    np.testing.assert_allclose(got, ref, atol=2e-3)
