"""Bit-exactness of the Pallas DMA frame extraction (pallas_extract) vs
the vmapped-dynamic_slice gather (phy.sync.extract_frames) — interpret
mode on CPU; the on-chip A/B lives in bench/stages.py / scripts."""

import numpy as np
import jax.numpy as jnp
import pytest

from ofdm_uhd_tpu.core.spec import config
from ofdm_uhd_tpu.kernels.pallas_extract import extract_frames_pallas
from ofdm_uhd_tpu.phy import sync as PS

rng = np.random.default_rng(23)


def _cap(n):
    return (rng.normal(size=n) + 1j * rng.normal(size=n)
            ).astype(np.complex64)


@pytest.mark.parametrize("n,fl,mf", [
    (50000, 4032, 12),       # C3 geometry
    (20000, 800, 5),         # C1-ish
    (9000, 2048, 3),         # frame_len a 128 multiple
])
def test_extract_pallas_matches_gather(n, fl, mf):
    spec = config("c1").with_(n_occupied=52)  # only frame_len is used

    class S:                  # minimal spec stand-in for extract_frames
        frame_len = fl

    cap = _cap(n)
    ds = np.sort(rng.integers(0, n - fl, size=mf)).astype(np.int32)
    ref = np.asarray(PS.extract_frames(S, jnp.asarray(cap),
                                       jnp.asarray(ds)))
    got = np.asarray(extract_frames_pallas(jnp.asarray(cap),
                                           jnp.asarray(ds), fl))
    np.testing.assert_array_equal(got, ref)


def test_extract_pallas_edge_offsets():
    """Clamp semantics: d=0, d near the end (frame runs past the capture
    -> zero tail), d=n and d>n (all zeros, gather-clamped)."""
    n, fl = 12000, 1500

    class S:
        frame_len = fl

    cap = _cap(n)
    ds = np.asarray([0, n - fl, n - 7, n, n + 400, 3], np.int32)
    ref = np.asarray(PS.extract_frames(S, jnp.asarray(cap),
                                       jnp.asarray(ds)))
    got = np.asarray(extract_frames_pallas(jnp.asarray(cap),
                                           jnp.asarray(ds), fl))
    np.testing.assert_array_equal(got, ref)
    assert np.all(got[3] == 0)            # d = n -> pure pad
    assert np.all(got[2][7:] == 0)        # past-capture tail is zeros


def test_extract_pallas_vmapped():
    """The capture chain vmaps extraction over captures (C3 headline
    batch) — the batched form must equal per-capture calls."""
    import jax
    n, fl, mf, b = 16000, 1200, 4, 3
    caps = np.stack([_cap(n) for _ in range(b)])
    ds = np.stack([np.sort(rng.integers(0, n - fl, size=mf))
                   for _ in range(b)]).astype(np.int32)
    f = lambda c, d: extract_frames_pallas(c, d, fl)
    got = np.asarray(jax.vmap(f)(jnp.asarray(caps), jnp.asarray(ds)))
    for i in range(b):
        one = np.asarray(f(jnp.asarray(caps[i]), jnp.asarray(ds[i])))
        np.testing.assert_array_equal(got[i], one)
