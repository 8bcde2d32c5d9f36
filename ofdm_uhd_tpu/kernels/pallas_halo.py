"""Optional Pallas remote-DMA halo exchange (SURVEY.md §5.8 fast path).

The default halo path is `lax.ppermute` (XLA collective). This kernel moves
the same halo with an explicit inter-chip RDMA (`pltpu.make_async_remote_copy`
with send/recv semaphores — the pattern of [S:33-67]/[S:165-207]), which a
future revision can overlap with compute by splitting start/wait around the
local work. Guarded behind StreamRx(..., pallas_halo=True); equality against
the ppermute path is asserted in tests where the runtime supports it
(multi-chip TPU, or interpret-mode distributed emulation), else skipped.

Semantics (matching shard/time_parallel._shard_step):
  shard i sends `head` (its first H samples) to shard i-1; shard i receives
  shard i+1's head. Shard t-1 receives nothing (the caller substitutes the
  fresh chunk tail); shard 0 sends nothing off the mesh edge.

Complex samples travel as stacked (2, H) f32 planes: bitcast_convert_type
on complex64 crashes every runtime tried (r1 VERDICT item 4), and this
environment's PJRT runtime cannot carry complex across executable
boundaries anyway (core/boundary.py) — planar f32 is the uniform answer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_kernel(time_axis: str, frame_axis: str | None,
                 in_ref, out_ref, send_sem, recv_sem):
    """Uniform ring: every shard sends its head to (i-1) mod t and waits
    for its own send + receive. Symmetric participation keeps the DMA
    semaphore accounting uniform (the asymmetric pl.when send/recv split
    aborted the interpret-mode runtime); the wrap-around payload shard
    t-1 receives from shard 0 is overwritten by the caller with the fresh
    chunk tail, exactly like the ppermute path's zero fill."""
    my_id = jax.lax.axis_index(time_axis)
    t = jax.lax.axis_size(time_axis)
    dst = jax.lax.rem(my_id - 1 + t, t)
    # 1-D meshes take a SCALAR device id (a 1-tuple trips a tracer==tuple
    # comparison inside the DMA machinery); 2-D meshes take mesh coords
    coords = ((jax.lax.axis_index(frame_axis), dst)
              if frame_axis else dst)
    copy = pltpu.make_async_remote_copy(
        src_ref=in_ref,
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=coords,
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    copy.start()
    copy.wait()


def halo_from_right_pallas(head: jax.Array, time_axis: str = "time",
                           frame_axis: str | None = "frame",
                           interpret: bool = False) -> jax.Array:
    """Inside shard_map: every shard's `head` [H] complex64 -> its right
    neighbour's head (zeros on the last shard). RDMA equivalent of
    lax.ppermute(head, time_axis, [(i, i-1)])."""
    h = head.shape[-1]
    planes = jnp.stack([jnp.real(head), jnp.imag(head)]).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_halo_kernel, time_axis, frame_axis),
        out_shape=jax.ShapeDtypeStruct((2, h), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=7),
        interpret=interpret,
    )(planes)
    halo = jax.lax.complex(out[0], out[1])
    t = jax.lax.axis_size(time_axis)
    idx = jax.lax.axis_index(time_axis)
    return jnp.where(idx == t - 1, jnp.zeros_like(halo), halo)
