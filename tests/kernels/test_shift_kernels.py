"""Equality of the shifted-accumulate VPU filter tier (pallas_shift) vs
the conv_backend XLA formulations (themselves golden-validated in
test_backend_equality.py). Runs in interpret mode on CPU; the on-chip
A/B (bench/kernels_ab.py) re-asserts equality on real hardware.

Shapes deliberately exercise: non-multiple-of-C lengths (row padding),
multi-chunk signals (the cross-row halo path), batched inputs (plane
tiling), and both resampler factors the specs use.
"""

from __future__ import annotations

import numpy as np
import pytest

from ofdm_uhd_tpu.kernels import conv_backend as CB
from ofdm_uhd_tpu.research import pallas_shift as PS
from ofdm_uhd_tpu.kernels.sync import sc_correlate, sc_metric
from ofdm_uhd_tpu.phy.tables import resample_filter

rng = np.random.default_rng(7)


def _sig(shape):
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)
            ).astype(np.complex64)


@pytest.mark.parametrize("shape", [(5000,), (3, 4500), (2, 2, 2048)])
def test_fir_shift_matches_xla(shape):
    taps = np.asarray(resample_filter(8, 1))
    x = _sig(shape)
    ref = np.asarray(CB.fir_same(x, taps))
    got = np.asarray(PS.fir_shift_pallas(x, taps))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_fir_shift_short_taps():
    taps = np.asarray([0.25, 0.5, 0.25], np.float32)
    x = _sig((2, 1000))
    ref = np.asarray(CB.fir_same(x, taps))
    got = np.asarray(PS.fir_shift_pallas(x, taps))
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("m,n", [(8, 40960), (2, 9000)])
def test_decim_shift_matches_xla(m, n):
    taps = np.asarray(resample_filter(m, 1))
    x = _sig((n,))
    ref = np.asarray(CB.polyphase_decim_xla(x, m, taps))
    got = np.asarray(PS.polyphase_decim_shift_pallas(x, m, taps))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_decim_shift_batched():
    taps = np.asarray(resample_filter(8, 1))
    x = _sig((5, 16384))
    ref = np.asarray(CB.polyphase_decim_xla(x, 8, taps))
    got = np.asarray(PS.polyphase_decim_shift_pallas(x, 8, taps))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("l,n", [(8, 5120), (2, 3000)])
def test_interp_shift_matches_xla(l, n):
    taps = np.asarray(resample_filter(l, 1))
    x = _sig((n,))
    ref = np.asarray(CB.polyphase_interp_xla(x, l, taps))
    got = np.asarray(PS.polyphase_interp_shift_pallas(x, l, taps))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_interp_shift_batched():
    taps = np.asarray(resample_filter(8, 1))
    x = _sig((6, 2100))
    ref = np.asarray(CB.polyphase_interp_xla(x, 8, taps))
    got = np.asarray(PS.polyphase_interp_shift_pallas(x, 8, taps))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("l,n", [(32, 9000), (128, 20480)])
def test_sc_correlate_shift_matches_xla(l, n):
    x = _sig((n,))
    p_ref, r_ref = (np.asarray(v) for v in sc_correlate(x, l, "xla"))
    p_got, r_got = (np.asarray(v)
                    for v in PS.sc_correlate_shift_pallas(x, l))
    assert p_got.shape == p_ref.shape and r_got.shape == r_ref.shape
    np.testing.assert_allclose(p_got, p_ref, atol=2e-4)
    np.testing.assert_allclose(r_got, r_ref, atol=2e-4)
    # the end-to-end metric the detector thresholds on
    import jax.numpy as jnp
    m_ref = np.asarray(sc_metric(jnp.asarray(p_ref), jnp.asarray(r_ref)))
    m_got = np.asarray(sc_metric(jnp.asarray(p_got), jnp.asarray(r_got)))
    np.testing.assert_allclose(m_got, m_ref, atol=1e-3)


def test_sc_correlate_shift_batched():
    x = _sig((3, 6000))
    p_ref, r_ref = (np.asarray(v) for v in sc_correlate(x, 32, "xla"))
    p_got, r_got = (np.asarray(v)
                    for v in PS.sc_correlate_shift_pallas(x, 32))
    np.testing.assert_allclose(p_got, p_ref, atol=2e-4)
    np.testing.assert_allclose(r_got, r_ref, atol=2e-4)
