"""Numerics sanitizers (SURVEY.md §5.2): the chain must be NaN-free under
jax_debug_nans even on degenerate inputs (zeros, idle captures), and the
noiseless EVM floor must sit far below any channel bound (§7.3 #6)."""

import numpy as np
import pytest

import jax

from ofdm_uhd_tpu.core.spec import config
from ofdm_uhd_tpu.pipeline import TxPipeline, RxPipeline


def test_chain_nan_free_under_debug_nans():
    spec = config("c1")
    rng = np.random.default_rng(0)
    p = rng.integers(0, 2, (2, spec.payload_bits_per_frame)).astype(np.uint8)
    with jax.debug_nans(True):
        frames = TxPipeline(spec)(p)
        out = RxPipeline(spec).rx_aligned(frames)
        jax.block_until_ready(out)
    assert np.asarray(out["crc_ok"]).all()


def test_degenerate_inputs_no_nans():
    spec = config("c1")
    rx = RxPipeline(spec)
    zeros = np.zeros((2, spec.frame_len), dtype=np.complex64)
    out = rx.rx_aligned(zeros)  # all-zero frames: EQ eps guards divide
    for k in ("evm_db", "cpe"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    assert not np.asarray(out["crc_ok"]).any()
    # idle capture through the sync path
    idle = np.zeros(4 * spec.frame_len, dtype=np.complex64)
    out2 = rx.rx_capture(idle, max_frames=3)
    assert not np.asarray(out2["valid"]).any()
    assert np.isfinite(np.asarray(out2["eps"])).all()


def test_noiseless_evm_floor():
    """f32 chain EVM floor must be < -120 dB (SURVEY.md §7.3 #6)."""
    spec = config("c3")  # largest constellation
    rng = np.random.default_rng(1)
    p = rng.integers(0, 2, (2, spec.payload_bits_per_frame)).astype(np.uint8)
    frames = TxPipeline(spec)(p)
    out = RxPipeline(spec).rx_aligned(frames)
    assert np.asarray(out["evm_db"]).max() < -120
