"""Frame-parallel (data-parallel) sharding of the batched TX/RX pipelines.

SURVEY.md §2.3 row 'DP -> frame parallel': the frame/batch axis is sharded
over the 'frame' mesh axis with NamedSharding; the per-frame chain needs no
cross-talk, so the only collective is a psum of scalar metrics inside
shard_map — everything else is pure SPMD placement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.spec import WaveformSpec
from ..pipeline import rx as RXP
from ..pipeline import tx as TXP


def tx_frames_sharded(spec: WaveformSpec, mesh: jax.sharding.Mesh):
    """Returns jitted fn: payloads [B, bits] -> frames [B, frame_len_radio],
    B sharded over the 'frame' mesh axis."""
    in_s = NamedSharding(mesh, P("frame", None))
    out_s = NamedSharding(mesh, P("frame", None))
    return jax.jit(functools.partial(TXP._tx_step, spec),
                   in_shardings=in_s, out_shardings=out_s)


def rx_frames_sharded(spec: WaveformSpec, mesh: jax.sharding.Mesh,
                      shift: int = 0):
    """Returns jitted fn: frames [B, len] -> result dict, frame-sharded.

    Scalar health metrics (frames decoded, mean EVM) are psum-reduced over
    the mesh inside shard_map so every host sees global counters
    (SURVEY.md §5.5).
    """
    def step(frames):
        out = RXP._rx_aligned(spec, shift, True, frames)

        def metrics(crc_ok, evm_db):
            n_ok = jax.lax.psum(jnp.sum(crc_ok.astype(jnp.int32)), "frame")
            evm = jax.lax.psum(jnp.sum(evm_db), "frame")
            return n_ok, evm

        n_ok, evm_sum = jax.shard_map(
            metrics, mesh=mesh,
            in_specs=(P("frame"), P("frame")),
            out_specs=(P(), P()),
        )(out["crc_ok"], out["evm_db"])
        out["n_ok_global"] = n_ok
        out["mean_evm_global"] = evm_sum / frames.shape[0]
        return out

    in_s = NamedSharding(mesh, P("frame", None))
    return jax.jit(step, in_shardings=in_s)
