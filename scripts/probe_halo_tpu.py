"""On-chip Mosaic-lowering probe for the RDMA halo kernel (VERDICT r2
item 6): does `halo_from_right_pallas` COMPILE (interpret=False) on the
real chip?

Multi-chip hardware does not exist here, so the ring degenerates to a
t=1 SELF-COPY: shard 0 sends its head to (0-1) mod 1 = itself. That is
exactly the question the probe answers — fft-1024 proved interpret-mode
success does not imply Mosaic compilability, and this is the one kernel
that had only ever executed under interpret=True on the virtual CPU mesh.

The self-ring makes the raw DMA output observable: the kernel's payload
lands back in the sender's own out_ref, so (before the caller's
last-shard zero substitution) out == in proves the remote-DMA machinery
(make_async_remote_copy + send/recv semaphores) lowered AND moved bytes.

Run (needs the axon tunnel, sole user):
    python scripts/probe_halo_tpu.py
Writes a dated verdict line to bench/results/halo_probe.jsonl either way.
"""

from __future__ import annotations

import functools
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from ofdm_uhd_tpu.kernels import pallas_halo as PH
    from ofdm_uhd_tpu.metrics import JsonlLogger
    from ofdm_uhd_tpu.shard.mesh import make_mesh

    rec = {"probe": "halo-rdma-t1-selfring",
           "device": jax.devices()[0].device_kind,
           "interpret": False}
    h = 512
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])

    def body(x):
        # raw kernel output BEFORE the last-shard zero substitution: on the
        # t=1 self-ring the DMA writes the payload back into our own
        # out_ref, so equality with the input proves bytes moved
        planes = jnp.stack([jnp.real(x), jnp.imag(x)]).astype(jnp.float32)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        # mesh is 2-D ('frame','time') even at 1x1, so the DMA needs BOTH
        # mesh coordinates (a scalar id raises "1 ids for a 2D mesh")
        return pl.pallas_call(
            functools.partial(PH._halo_kernel, "time", "frame"),
            out_shape=jax.ShapeDtypeStruct((2, h), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
            # no collective_id: Mosaic rejects it outside a custom-barrier
            # multi-device launch ("has to be unspecified or None when not
            # using a custom barrier") — the single-chip self-ring needs
            # only the side-effect flag
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=False,
        )(planes)

    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P("time"),
                               out_specs=P(None, "time"), check_vma=False))
    rng = np.random.default_rng(0)
    x = (rng.normal(size=h) + 1j * rng.normal(size=h)).astype(np.complex64)
    pair = np.ascontiguousarray(np.stack([x.real, x.imag]))

    signal.signal(signal.SIGALRM, lambda *_: (_ for _ in ()).throw(
        TimeoutError("compile/run budget exceeded")))
    signal.alarm(480)  # cold-tunnel allowance
    t0 = time.perf_counter()
    try:
        from ofdm_uhd_tpu.core import boundary
        if boundary.needs_planar():
            fnp = jax.jit(jax.shard_map(
                lambda p: body(jax.lax.complex(p[0], p[1])), mesh=mesh,
                in_specs=P(None, "time"), out_specs=P(None, "time"),
                check_vma=False))
            out = np.asarray(fnp(pair))
        else:
            out = np.asarray(fn(x))
        dt = time.perf_counter() - t0
        exact = bool(np.array_equal(out[0], pair[0])
                     and np.array_equal(out[1], pair[1]))
        rec.update({"ok": True, "compile_run_s": round(dt, 1),
                    "selfcopy_exact": exact})
        print(f"# RDMA halo COMPILED and ran on-chip in {dt:.1f}s; "
              f"self-copy bit-exact: {exact}", file=sys.stderr)
    except Exception as e:
        rec.update({"ok": False, "error": f"{type(e).__name__}: "
                    f"{str(e)[:400]}"})
        print(f"# RDMA halo probe FAILED: {rec['error']}", file=sys.stderr)
    finally:
        signal.alarm(0)
    JsonlLogger("bench/results/halo_probe.jsonl").log(rec)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
