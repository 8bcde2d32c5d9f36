"""DMA deframer parity (interpret mode; the on-chip path is a documented
dead end — see pallas_deframe docstring — but the semantics stay tested
in case a future backend lifts the DMA offset-alignment rule)."""

import numpy as np
import jax
import jax.numpy as jnp

from ofdm_uhd_tpu.core.spec import config
from ofdm_uhd_tpu.research.pallas_deframe import extract_frames_dma
from ofdm_uhd_tpu.phy.sync import extract_frames


def test_deframe_matches_gather():
    spec = config("c3")
    rng = np.random.default_rng(0)
    n = 50000
    cap = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    ds = jnp.asarray(np.sort(
        rng.integers(0, n - spec.frame_len, 6)).astype(np.int32))
    ref = np.asarray(extract_frames(spec, jnp.asarray(cap), ds))
    got = np.asarray(extract_frames_dma(jnp.asarray(cap), ds,
                                        spec.frame_len))
    np.testing.assert_array_equal(got, ref)


def test_deframe_vmapped():
    spec = config("c1")
    rng = np.random.default_rng(1)
    n = 20000
    cap = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    caps = jnp.asarray(np.stack([cap, cap * np.complex64(1 + 1e-6)]))
    ds = jnp.asarray(np.sort(
        rng.integers(0, n - spec.frame_len, 4)).astype(np.int32))
    dss = jnp.stack([ds, ds + 5])
    ref = jax.vmap(lambda c, d: extract_frames(spec, c, d))(caps, dss)
    got = jax.vmap(lambda c, d: extract_frames_dma(c, d, spec.frame_len)
                   )(caps, dss)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
