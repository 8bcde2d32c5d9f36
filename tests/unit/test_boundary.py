"""Executable-boundary planarization (core/boundary.py): with
OFDM_FORCE_PLANAR=1 the planar path must reproduce the normal path
bit-for-bit on CPU — the same invariant the axon TPU runtime relies on."""

import os
import zlib

import numpy as np
import pytest

from ofdm_uhd_tpu.core import boundary
from ofdm_uhd_tpu.core.platform import fetch
from ofdm_uhd_tpu.core.spec import ChannelSpec, config
from ofdm_uhd_tpu.channel import apply_channel, make_capture
from ofdm_uhd_tpu.golden import GoldenModem


@pytest.fixture
def forced_planar():
    os.environ["OFDM_FORCE_PLANAR"] = "1"
    try:
        yield
    finally:
        os.environ.pop("OFDM_FORCE_PLANAR", None)


def test_encode_decode_roundtrip():
    tree = {"c": (np.arange(6) + 1j * np.arange(6)).astype(np.complex64),
            "f": np.float32(3.5), "i": np.arange(4, dtype=np.int32)}
    enc = boundary.encode_host(tree)
    assert isinstance(enc["c"], boundary.Planar)
    assert enc["c"].pair.dtype == np.float32
    assert enc["f"] == tree["f"] and enc["i"] is tree["i"]
    dec = boundary.decode(enc)
    assert dec["c"].dtype == np.complex64
    assert np.array_equal(dec["c"], tree["c"])
    # double-encode is a no-op
    assert boundary.encode_host(enc)["c"] is enc["c"]


def _payloads(spec, n):
    rng = np.random.default_rng(zlib.crc32(b"planar") % 2**31)
    return rng.integers(0, 2, (n, spec.payload_bits_per_frame)
                        ).astype(np.uint8)


def test_tx_rx_planar_bit_exact(forced_planar):
    from ofdm_uhd_tpu.pipeline import RxPipeline, TxPipeline
    spec = config("c2")
    payloads = _payloads(spec, 8)
    tx_out = TxPipeline(spec)(payloads)
    assert isinstance(tx_out, boundary.Planar)
    frames = fetch(tx_out)
    assert frames.dtype == np.complex64
    gm = GoldenModem(spec)
    assert np.allclose(frames, gm.tx(payloads), atol=2e-6)

    rx_in = np.stack([apply_channel(frames[i], ChannelSpec(snr_db=22.0),
                                    spec.n_sc, seed=i)
                      for i in range(8)]).astype(np.complex64)
    out_p = RxPipeline(spec).rx_aligned(rx_in)
    os.environ.pop("OFDM_FORCE_PLANAR")
    out_n = RxPipeline(spec).rx_aligned(rx_in)
    assert np.array_equal(np.asarray(out_p["payload"]),
                          np.asarray(out_n["payload"]))
    assert np.array_equal(fetch(out_p["h"]), fetch(out_n["h"]))
    assert np.asarray(out_p["crc_ok"]).all()


def test_rx_capture_planar(forced_planar):
    from ofdm_uhd_tpu.pipeline import RxPipeline
    spec = config("c3")
    payloads = _payloads(spec, 4)
    gm = GoldenModem(spec)
    frames = np.stack([gm.modulate_frame(p) for p in payloads])
    cap = make_capture(frames, ChannelSpec(snr_db=28.0, cfo=0.6,
                                           timing_offset=80),
                       spec.n_sc, gap=250, seed=5).astype(np.complex64)
    x = boundary.device_put_planar(cap)
    assert isinstance(x, boundary.Planar)
    out = RxPipeline(spec).rx_capture(x, max_frames=6)
    crc = np.asarray(out["crc_ok"])
    assert crc.sum() == 4
    assert np.array_equal(np.asarray(out["payload"])[:4], payloads)


def test_stream_planar_bit_exact(forced_planar):
    from ofdm_uhd_tpu.pipeline.stream import StreamRx
    from ofdm_uhd_tpu.shard.mesh import make_mesh
    spec = config("c5")
    gm = GoldenModem(spec)
    payloads = _payloads(spec, 5)
    frames = np.stack([gm.modulate_frame(p) for p in payloads])
    cap = make_capture(frames, ChannelSpec(snr_db=25.0, cfo=0.5,
                                           timing_offset=400),
                       spec.n_sc, gap=600, seed=9).astype(np.complex64)
    mesh = make_mesh(1, 4)
    rx = StreamRx(spec, mesh=mesh)
    got_p = rx.process(cap) + rx.flush()
    os.environ.pop("OFDM_FORCE_PLANAR")
    rx_n = StreamRx(spec, mesh=mesh)
    got_n = rx_n.process(cap) + rx_n.flush()
    assert len(got_p) == len(got_n) == 5
    for a, b in zip(got_p, got_n):
        assert a.start == b.start
        assert np.array_equal(a.payload, b.payload)
        assert a.crc_ok and b.crc_ok


def test_checkpoint_roundtrip_planar(tmp_path, forced_planar):
    from ofdm_uhd_tpu.pipeline.stream import StreamRx
    from ofdm_uhd_tpu.shard.mesh import make_mesh
    spec = config("c5")
    gm = GoldenModem(spec)
    payloads = _payloads(spec, 4)
    frames = np.stack([gm.modulate_frame(p) for p in payloads])
    cap = make_capture(frames, ChannelSpec(snr_db=25.0), spec.n_sc,
                       gap=500, seed=3).astype(np.complex64)
    rx = StreamRx(spec, mesh=make_mesh(1, 2))
    cut = 2 * rx.radio_chunk
    got = rx.process(cap[:cut])
    rx.save_state(str(tmp_path / "st.npz"))
    rx2 = StreamRx(spec, mesh=make_mesh(1, 2))
    rx2.load_state(str(tmp_path / "st.npz"))
    got += rx2.process(cap[cut:]) + rx2.flush()
    assert len(got) == 4
    assert all(g.crc_ok and np.array_equal(g.payload, p)
               for g, p in zip(got, payloads))
