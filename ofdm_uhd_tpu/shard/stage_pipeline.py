"""Pipeline parallelism (PP) over the RX chain — SURVEY.md §2.3 stretch goal.

The chain is staged across chips at its one natural boundary: the LLR
array between the symbol-domain front end (FFT -> chanest/EQ/CPE -> demap,
pipeline/rx.py _frontend) and the bit-domain decoder (deinterleave ->
depuncture -> Viterbi -> descramble -> CRC, _decode). Two stages — the
front end is a fused elementwise/matmul graph XLA schedules well as one
unit, while Viterbi is a latency-bound sequential recurrence; splitting
elsewhere would cut fused work for no overlap win (SURVEY.md §2.3 keeps
whole-chain-per-chip as the default and this module as the opt-in).

Schedule: GPipe over M microbatches on a 2-device 'stage' mesh axis.
Every scan step k, stage 0 front-ends microbatch k while stage 1 decodes
microbatch k-1 (one-step bubble); the LLR buffer rides a `ppermute`
0 -> 1 at the end of each step. Both branches of the `lax.switch` live in
one SPMD program — each device executes only its own stage's branch.
Per-stage outputs are zero on the other stage, so a `psum` over 'stage'
replicates the real values everywhere.

Exactness: stage placement cannot change numerics (the stages are the
same pure functions the fused path calls), asserted bit-for-bit in
tests/distributed/test_stage_pipeline.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..core.spec import WaveformSpec
from ..pipeline import rx as RXP

N_STAGES = 2


def _pipeline_body(spec: WaveformSpec, shift: int, n_micro: int, mb: int,
                   axis: str, frames):
    """shard_map body: frames [B, frame_len] replicated; B = n_micro * mb."""
    idx = jax.lax.axis_index(axis)
    coded = spec.coded_bits_per_frame
    mbs = frames.reshape(n_micro, mb, frames.shape[-1])
    # one drain step: stage 0 sees a dummy microbatch while stage 1
    # decodes the last real one
    mbs = jnp.concatenate([mbs, jnp.zeros_like(mbs[:1])])

    dec_shapes = jax.eval_shape(
        functools.partial(RXP._decode, spec),
        jax.ShapeDtypeStruct((mb, coded), jnp.float32))
    zero_dec = tuple(jnp.zeros(s.shape, s.dtype) for s in dec_shapes)

    def step(llr_buf, mb_frames):
        def front(_):
            out = RXP._frontend(spec, RXP._to_baseband(spec, mb_frames),
                                shift)
            return out["llr"], zero_dec, out["evm_db"]

        def back(buf):
            payload, crc_ok = RXP._decode(spec, buf)
            return (jnp.zeros((mb, coded), jnp.float32), (payload, crc_ok),
                    jnp.zeros((mb,), jnp.float32))

        llr, dec, evm = jax.lax.switch(idx, [front, back], llr_buf)
        llr_next = jax.lax.ppermute(llr, axis, [(0, 1)])
        return llr_next, (dec, evm)

    _, ((payload, crc_ok), evm) = jax.lax.scan(
        step, jnp.zeros((mb, coded), jnp.float32), mbs)

    # stage 1 produced microbatch k at scan step k+1; stage 0 produced evm
    # at step k. Other-stage slots are zeros -> psum replicates the values.
    payload = jax.lax.psum(payload[1:].astype(jnp.int32), axis)
    crc_ok = jax.lax.psum(crc_ok[1:].astype(jnp.int32), axis) > 0
    evm = jax.lax.psum(evm[:n_micro], axis)
    flat = lambda a: a.reshape((n_micro * mb,) + a.shape[2:])
    return {"payload": flat(payload).astype(jnp.uint8),
            "crc_ok": flat(crc_ok), "evm_db": flat(evm)}


def rx_aligned_pipelined(spec: WaveformSpec, mesh: jax.sharding.Mesh,
                         n_micro: int, shift: int = 0):
    """Jitted 2-stage pipelined aligned RX.

    mesh must have a 'stage' axis of size 2; the batch B of
    frames [B, frame_len] must be divisible by n_micro.
    Returns fn(frames) -> {payload, crc_ok, evm_db} (replicated).
    """
    if mesh.shape.get("stage") != N_STAGES:
        raise ValueError(f"mesh needs a 'stage' axis of size {N_STAGES}, "
                         f"got {dict(mesh.shape)}")

    def run(frames):
        b = frames.shape[0]
        if b % n_micro:
            raise ValueError(f"batch {b} not divisible by n_micro {n_micro}")
        mb = b // n_micro
        body = functools.partial(_pipeline_body, spec, shift, n_micro, mb,
                                 "stage")
        return jax.shard_map(body, mesh=mesh, in_specs=P(),
                             out_specs=P(), check_vma=False)(frames)

    return jax.jit(run)
