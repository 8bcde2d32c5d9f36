"""Continuous-stream receiver: host loop around the sharded streaming step.

Target call stack SURVEY.md §3.4 (pod_rx): the host feeds fixed-size chunks
(the UHD ring buffer's replacement is the double-buffered device_put of the
next chunk while the current one computes); the jitted step shards time
blocks over the mesh, exchanges ppermute halos, psum-averages channel/CFO
tracking, and returns fixed-capacity decoded-frame slots that the host
filters and orders.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..core.spec import WaveformSpec
from ..core.state import StreamState
from ..shard.mesh import make_mesh
from ..shard.time_parallel import make_stream_step


@dataclasses.dataclass
class StreamFrame:
    start: int          # global sample offset of the frame
    payload: np.ndarray
    crc_ok: bool
    eps: float
    evm_db: float


class StreamRx:
    """Streaming OFDM receiver over a ('frame','time') mesh's time axis."""

    def __init__(self, spec: WaveformSpec, mesh=None, chunk_len: int | None = None,
                 max_frames_per_shard: int | None = None,
                 threshold: float = 0.5, pallas_halo: bool = False,
                 reshard: bool = False, track_mode: bool = True,
                 agc: bool = True):
        self.spec = spec
        self.mesh = mesh if mesh is not None else make_mesh(
            1, len(jax.devices()))
        t = self.mesh.shape["time"]
        h = StreamState.halo_len(spec)
        m = spec.resample_m
        if chunk_len is None:
            # per-shard block rounded up to a multiple of M so the radio
            # chunk (chunk_len * L / M) is integral and L-aligned
            cb = -(-max(2 * h, 4 * spec.frame_len) // m) * m
            chunk_len = t * cb
        if (chunk_len * spec.resample_l) % m:
            raise ValueError("chunk_len*L must be divisible by M")
        self.chunk_len = chunk_len              # baseband samples per step
        # radio-rate samples per step (rational: radio = baseband * L / M)
        self.radio_chunk = chunk_len * spec.resample_l // m
        self._step, self.cb, self.h = make_stream_step(
            spec, self.mesh, chunk_len, max_frames_per_shard, threshold,
            pallas_halo=pallas_halo, reshard=reshard, track_mode=track_mode,
            agc=agc)
        self.state = StreamState.init(spec)
        self.rescued = 0       # frames recovered by the TRACK-mode retry
        self._buf = np.zeros(0, dtype=np.complex64)
        # host mirror of state.steps (unbounded Python int): composes the
        # wrap-free global timebase base = steps * chunk_len without
        # fetching device state mid-stream
        self._steps = 0

    def tracking(self) -> dict:
        """Pod-tracked channel/CFO state (SURVEY.md §5.3/§5.5)."""
        from ..core.platform import fetch
        h_t = np.asarray(fetch(self.state.h_track))
        return {
            "eps_track": float(np.asarray(fetch(self.state.eps_track))),
            "track_wt": float(np.asarray(fetch(self.state.track_wt))),
            "h_track_rms": float(np.sqrt(np.mean(np.abs(h_t) ** 2))),
            "rescued": self.rescued,
        }

    def _put_chunk(self, chunk: np.ndarray) -> jax.Array:
        """Build the (possibly multi-host) global sharded chunk array.

        Every process holds the full chunk host-side (the stream source is
        shared/replicated, as with a common capture file); each device
        receives only its own time-block. make_array_from_callback works
        identically in single- and multi-process SPMD (SURVEY.md §5.8).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..core import boundary
        if boundary.needs_planar():
            pair = np.ascontiguousarray(np.stack([chunk.real, chunk.imag]))
            sh = NamedSharding(self.mesh, P(None, "time"))
            arr = jax.make_array_from_callback(
                (2, self.radio_chunk), sh, lambda idx: pair[idx])
            return boundary.Planar(arr)
        sh = NamedSharding(self.mesh, P("time"))
        return jax.make_array_from_callback(
            (self.radio_chunk,), sh, lambda idx: chunk[idx])

    def process(self, samples: np.ndarray) -> list[StreamFrame]:
        """Feed samples at the RADIO rate (any length); returns frames
        completed so far (decoded at baseband).

        Double-buffered feed (the UHD ring buffer's replacement, SURVEY.md
        §2.2-K4): the next chunk is device_put and its step dispatched
        before the previous step's outputs are fetched, so host transfers
        overlap device compute (jit dispatch is async).
        """
        self._buf = np.concatenate([self._buf, samples.astype(np.complex64)])
        n_chunks = len(self._buf) // self.radio_chunk
        out: list[StreamFrame] = []
        pending = None
        for i in range(n_chunks):
            chunk = self._buf[i * self.radio_chunk : (i + 1) * self.radio_chunk]
            dev = self._put_chunk(chunk)
            self.state, outs = self._step(self.state, dev)
            base = self._steps * self.chunk_len
            self._steps += 1
            if pending is not None:
                out.extend(self._collect(*pending))
            pending = (outs, base)
        self._buf = self._buf[n_chunks * self.radio_chunk:]
        if pending is not None:
            out.extend(self._collect(*pending))
        return out

    def flush(self) -> list[StreamFrame]:
        """Zero-pad the remainder (plus one extra chunk so the delayed tail
        is fully processed) and drain."""
        pad = (-len(self._buf)) % self.radio_chunk
        filler = np.zeros(pad + self.radio_chunk, dtype=np.complex64)
        return self.process(filler)

    def _collect(self, outs, base: int) -> list[StreamFrame]:
        # fetch the two packed metadata tensors first; the payload bits
        # (the only large array) are fetched only when frames exist. Every
        # fetch is a host<->device round trip on this runtime — this is
        # the whole step's host cost.
        meta_i = np.asarray(outs["meta_i"])
        self.rescued += int(meta_i[0, 3])
        owned = meta_i[:, 1].astype(bool)
        if not owned.any():
            return []
        meta_f = np.asarray(outs["meta_f"])
        nb = self.spec.payload_bits_per_frame
        payload = np.unpackbits(np.asarray(outs["payload"]),
                                axis=-1)[:, :nb]
        idx = np.nonzero(owned)[0]
        order = np.argsort(meta_i[idx, 2])
        res = []
        for i in idx[order]:
            res.append(StreamFrame(
                start=base + int(meta_i[i, 2]),
                payload=payload[i],
                crc_ok=bool(meta_i[i, 0]),
                eps=float(meta_f[i, 0]),
                evm_db=float(meta_f[i, 1]),
            ))
        return res

    # ---- checkpoint / resume (SURVEY.md §5.4) ----

    def save_state(self, path: str) -> None:
        """Checkpoint = StreamState leaves + the host-side chunk buffer."""
        import dataclasses as dc
        from ..core.platform import fetch
        leaves = {f.name: fetch(getattr(self.state, f.name))
                  for f in dc.fields(self.state)}
        # host step mirror saved as int64: the wrap-free global timebase
        np.savez(path, __buf__=self._buf,
                 __steps__=np.int64(self._steps), **leaves)

    def load_state(self, path: str) -> None:
        import dataclasses as dc
        z = np.load(path)
        # host leaves: they cross the executable boundary on the next step
        # (complex must not be device-resident there — core/boundary.py)
        kw = {}
        for f in dc.fields(StreamState):
            if f.name in z:
                kw[f.name] = z[f.name]
            elif f.name == "steps" and "samples" in z:
                # pre-rename checkpoints carried a device-side sample
                # count; steps = samples // chunk_len (always integral:
                # the counter only advanced by whole chunks)
                kw[f.name] = np.int32(int(z["samples"]) // self.chunk_len)
            else:
                raise ValueError(
                    f"incompatible checkpoint {path!r}: missing StreamState "
                    f"field {f.name!r} (has {sorted(z.files)})")
        self.state = StreamState(**kw)
        self._buf = z["__buf__"]
        if "__steps__" in z:
            self._steps = int(z["__steps__"])
        elif "steps" in z:
            self._steps = int(z["steps"])
        else:
            self._steps = int(z["samples"]) // self.chunk_len
