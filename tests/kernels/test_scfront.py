"""Fused S&C front end (pallas_scfront) vs the XLA compose — interpret
mode on CPU; on-chip A/B in scripts/r5 probes."""

import numpy as np
import jax.numpy as jnp
import pytest

from ofdm_uhd_tpu.kernels.sync import sc_correlate, sc_metric
from ofdm_uhd_tpu.kernels.pallas_scfront import sc_frontend_pallas

rng = np.random.default_rng(31)


@pytest.mark.parametrize("n,l", [(60000, 128), (20000, 128), (9000, 512)])
def test_scfront_matches_xla(n, l):
    r = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    p0, rr0 = sc_correlate(jnp.asarray(r), l, "xla")
    m0 = np.asarray(sc_metric(p0, rr0))
    p1, m1 = sc_frontend_pallas(jnp.asarray(r), l)
    assert p1.shape == p0.shape and m1.shape == m0.shape
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                               atol=2e-4 * np.sqrt(l))
    np.testing.assert_allclose(m1, m0, atol=1e-5)


def test_scfront_batched():
    n, l = 16000, 128
    r = (rng.normal(size=(3, n)) + 1j * rng.normal(size=(3, n))
         ).astype(np.complex64)
    p1, m1 = sc_frontend_pallas(jnp.asarray(r), l)
    for i in range(3):
        pi, mi = sc_frontend_pallas(jnp.asarray(r[i]), l)
        np.testing.assert_array_equal(np.asarray(m1[i]), np.asarray(mi))
        np.testing.assert_array_equal(np.asarray(p1[i]), np.asarray(pi))


def test_scfront_real_preamble_metric():
    """On an actual capture the fused metric must drive detection to the
    same frames as the XLA metric (plateau positions within a sample)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from bench_lib import build_capture
    from ofdm_uhd_tpu.core.spec import config
    spec = config("c3")
    cap, _ = build_capture(spec, 4, gap=300)
    l = spec.n_sc // 2
    p0, rr0 = sc_correlate(jnp.asarray(cap), l, "xla")
    m0 = np.asarray(sc_metric(p0, rr0))
    _, m1 = sc_frontend_pallas(jnp.asarray(cap), l)
    np.testing.assert_allclose(np.asarray(m1), m0, atol=1e-4)
