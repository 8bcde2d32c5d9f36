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
                 reshard: bool = False, track_mode: bool = True):
        if spec.resample_m != 1:
            raise NotImplementedError(
                "streaming supports integer decimation (resample_m == 1)")
        self.spec = spec
        self.mesh = mesh if mesh is not None else make_mesh(
            1, len(jax.devices()))
        t = self.mesh.shape["time"]
        h = StreamState.halo_len(spec)
        if chunk_len is None:
            chunk_len = t * max(2 * h, 4 * spec.frame_len)
        self.chunk_len = chunk_len              # baseband samples per step
        self.radio_chunk = chunk_len * spec.resample_l  # input samples/step
        self._step, self.cb, self.h = make_stream_step(
            spec, self.mesh, chunk_len, max_frames_per_shard, threshold,
            pallas_halo=pallas_halo, reshard=reshard, track_mode=track_mode)
        self.state = StreamState.init(spec)
        self.rescued = 0       # frames recovered by the TRACK-mode retry
        self._buf = np.zeros(0, dtype=np.complex64)

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
            if pending is not None:
                out.extend(self._collect(pending))
            pending = outs
        self._buf = self._buf[n_chunks * self.radio_chunk:]
        if pending is not None:
            out.extend(self._collect(pending))
        return out

    def flush(self) -> list[StreamFrame]:
        """Zero-pad the remainder (plus one extra chunk so the delayed tail
        is fully processed) and drain."""
        pad = (-len(self._buf)) % self.radio_chunk
        filler = np.zeros(pad + self.radio_chunk, dtype=np.complex64)
        return self.process(filler)

    def _collect(self, outs) -> list[StreamFrame]:
        self.rescued += int(np.asarray(outs["rescued"])[0])
        owned = np.asarray(outs["owned"])
        if not owned.any():
            return []
        idx = np.nonzero(owned)[0]
        d = np.asarray(outs["d_global"])[idx]
        order = np.argsort(d)
        res = []
        for i in idx[order]:
            res.append(StreamFrame(
                start=int(np.asarray(outs["d_global"])[i]),
                payload=np.asarray(outs["payload"][i]),
                crc_ok=bool(np.asarray(outs["crc_ok"][i])),
                eps=float(np.asarray(outs["eps"][i])),
                evm_db=float(np.asarray(outs["evm_db"][i])),
            ))
        return res

    # ---- checkpoint / resume (SURVEY.md §5.4) ----

    def save_state(self, path: str) -> None:
        """Checkpoint = StreamState leaves + the host-side chunk buffer."""
        import dataclasses as dc
        from ..core.platform import fetch
        leaves = {f.name: fetch(getattr(self.state, f.name))
                  for f in dc.fields(self.state)}
        np.savez(path, __buf__=self._buf, **leaves)

    def load_state(self, path: str) -> None:
        import dataclasses as dc
        z = np.load(path)
        # host leaves: they cross the executable boundary on the next step
        # (complex must not be device-resident there — core/boundary.py)
        kw = {f.name: z[f.name] for f in dc.fields(StreamState)}
        self.state = StreamState(**kw)
        self._buf = z["__buf__"]
