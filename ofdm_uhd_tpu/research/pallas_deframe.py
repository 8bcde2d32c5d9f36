"""Frame extraction as dynamic-offset DMA — the deframer as a TPU kernel.

The capture-mode chain extracts max_frames frames of frame_len samples at
data-dependent offsets ds (detection output). The XLA form — a vmapped
`dynamic_slice` — lowers to a gather whose consumers also inherit
pathological code on this backend (probe19-23: the extraction gather
costs ~11 ms/dispatch at the headline batch, and elementwise ops on
windows sliced from it cost ~15 ms more). This kernel replaces the
gather with what the hardware actually offers: one HBM->VMEM DMA per
frame at a scalar-prefetched dynamic offset (`PrefetchScalarGridSpec`:
the offsets are available before the body runs, so the DMA engine
streams frames back-to-back). Complex samples travel as (2, n) planes
(core/boundary.py).

Semantics identical to phy.sync.extract_frames: the capture is padded by
frame_len so out-of-range offsets read zeros.

STATUS (r4): measured dead end on this backend, kept for the record and
for interpret-mode parity tests. Mosaic enforces 128-lane alignment on
BOTH the DMA slice length (fixable: pad + trim) AND the dynamic offset
("Failed to prove that a tile index in dimension 1 is divisible by the
tiling") — but detection offsets are arbitrary samples, and the residual
sub-128 shift cannot run in-kernel (dynamic lane indexing is
unsupported) nor cheaply outside (a per-frame XLA shift re-creates the
same per-slice gather cost this kernel was meant to remove). The XLA
gather extraction (~11 ms/dispatch at the headline batch) stands as the
measured best.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _deframe_kernel(flp: int, ds_ref, cap_ref, out_ref, sem):
    i = pl.program_id(0)
    d = ds_ref[i]
    dma = pltpu.make_async_copy(
        cap_ref.at[:, pl.ds(d, flp)], out_ref.at[0], sem)
    dma.start()
    dma.wait()


def extract_frames_dma(capture: jax.Array, ds: jax.Array,
                       frame_len: int) -> jax.Array:
    """capture [n] complex, ds [mf] i32 -> frames [mf, frame_len] complex.

    Twin of phy.sync.extract_frames (gather form).
    """
    n = capture.shape[-1]
    mf = ds.shape[0]
    # the DMA's minor-dim length must be 128-aligned (Mosaic tiling rule,
    # probed r4: "Slice shape along dimension 1 must be aligned to
    # tiling"); dynamic OFFSETS are free. Copy a padded window and trim.
    flp = -(-frame_len // 128) * 128
    cap = jnp.concatenate(
        [capture, jnp.zeros(flp + 128, capture.dtype)])
    planes = jnp.stack([jnp.real(cap), jnp.imag(cap)]).astype(jnp.float32)
    ds = jnp.minimum(ds.astype(jnp.int32), jnp.int32(n))  # pad-safe clamp
    out = pl.pallas_call(
        functools.partial(_deframe_kernel, flp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mf,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 2, flp),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((mf, 2, flp), jnp.float32),
        interpret=_interpret(),
    )(ds, planes)
    return jax.lax.complex(out[:, 0, :frame_len], out[:, 1, :frame_len])
