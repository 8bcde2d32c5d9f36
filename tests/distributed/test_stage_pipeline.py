"""Pipeline-parallel RX (SURVEY.md §2.3 PP stretch goal): the staged chain
must match the fused single-device chain bit-for-bit — stage placement is
compute scheduling, not numerics."""

import zlib

import numpy as np

from ofdm_uhd_tpu.core.spec import ChannelSpec, config
from ofdm_uhd_tpu.channel import apply_channel
from ofdm_uhd_tpu.golden import GoldenModem
from ofdm_uhd_tpu.pipeline.rx import RxPipeline
from ofdm_uhd_tpu.shard.mesh import make_stage_mesh
from ofdm_uhd_tpu.shard.stage_pipeline import rx_aligned_pipelined


def _batch(spec, n, snr=22.0):
    rng = np.random.default_rng(zlib.crc32(b"pp") % 2**31)
    gm = GoldenModem(spec)
    payloads = rng.integers(0, 2, (n, spec.payload_bits_per_frame)
                            ).astype(np.uint8)
    frames = gm.tx(payloads)
    rx = np.stack([apply_channel(frames[i], ChannelSpec(snr_db=snr),
                                 spec.n_sc, seed=i) for i in range(n)])
    return rx.astype(np.complex64), payloads


def test_pipelined_equals_fused():
    spec = config("c2")
    frames, payloads = _batch(spec, 16)
    mesh = make_stage_mesh(2)
    pp = rx_aligned_pipelined(spec, mesh, n_micro=4)
    out = pp(frames)
    ref = RxPipeline(spec).rx_aligned(frames)
    assert np.array_equal(np.asarray(out["payload"]),
                          np.asarray(ref["payload"]))
    assert np.array_equal(np.asarray(out["crc_ok"]), np.asarray(ref["crc_ok"]))
    assert np.allclose(np.asarray(out["evm_db"]), np.asarray(ref["evm_db"]),
                       atol=0.0)  # identical graphs -> identical floats
    assert np.asarray(out["crc_ok"]).all()
    assert np.array_equal(np.asarray(out["payload"]), payloads)


def test_pipelined_with_resampling():
    """C4-style spec exercises the baseband stage inside the front end."""
    spec = config("c4").with_(n_data_syms=2)
    frames, payloads = _batch(spec, 8, snr=30.0)
    mesh = make_stage_mesh(2)
    pp = rx_aligned_pipelined(spec, mesh, n_micro=2)
    out = pp(frames)
    ref = RxPipeline(spec).rx_aligned(frames)
    assert np.array_equal(np.asarray(out["payload"]),
                          np.asarray(ref["payload"]))
    assert np.asarray(out["crc_ok"]).all()
