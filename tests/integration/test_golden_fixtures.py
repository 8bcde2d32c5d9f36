"""Golden-vector pinning: frozen captures must decode identically forever
(SURVEY.md §4 regression tier). Both the golden chain and the JAX pipeline
are checked against the pinned payloads/offsets."""

import os

import numpy as np
import pytest

from ofdm_uhd_tpu.core.spec import config
from ofdm_uhd_tpu.golden import GoldenModem
from ofdm_uhd_tpu.pipeline import RxPipeline
from ofdm_uhd_tpu.phy import agc as AGC

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "fixtures")


@pytest.mark.parametrize("name", ["c1", "c2", "c3"])
def test_pinned_capture_decodes(name):
    z = np.load(os.path.join(FIXDIR, f"golden_{name}.npz"))
    spec = config(name)
    # golden chain reproduces the pinned outputs exactly
    gm = GoldenModem(spec)
    results = gm.rx_capture(z["capture"].astype(np.complex128))
    assert len(results) == len(z["payloads"])
    for (d, eps, r), p, d0, e0 in zip(results, z["payloads"], z["starts"],
                                      z["eps"]):
        assert r.crc_ok and np.array_equal(r.payload, p)
        assert d == d0
        # fixture eps came from the float64 capture; the stored capture is
        # complex64, so allow quantization-level slack
        assert abs(eps - e0) < 1e-6
    # JAX capture pipeline decodes the same payloads
    out = RxPipeline(spec).rx_capture(z["capture"], max_frames=6)
    n = len(z["payloads"])
    assert np.asarray(out["valid"]).sum() == n
    assert np.asarray(out["crc_ok"])[:n].all()
    assert np.array_equal(np.asarray(out["payload"])[:n], z["payloads"])


def test_agc_block():
    rng = np.random.default_rng(3)
    x = ((rng.standard_normal((2, 500)) + 1j * rng.standard_normal((2, 500)))
         * 0.01).astype(np.complex64)
    y, g = AGC.agc_normalize(x)
    np.testing.assert_allclose(np.mean(np.abs(np.asarray(y)) ** 2, axis=-1),
                               1.0, rtol=1e-4)
    ref = AGC.agc_normalize_np(x[0].astype(np.complex128))
    np.testing.assert_allclose(np.asarray(y)[0], ref, atol=1e-4)
    # idle block passes through
    z = np.zeros((1, 100), dtype=np.complex64)
    y2, g2 = AGC.agc_normalize(z)
    assert np.all(np.asarray(y2) == 0) and np.asarray(g2)[0] == 1.0
