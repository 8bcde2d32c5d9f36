"""Bisect which TX sub-op fails to materialize on the axon TPU at batch 32."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def stage(name, fn):
    t0 = time.time()
    try:
        out = jax.jit(fn)()
        out = jax.block_until_ready(out)
        _ = [np.asarray(x) for x in jax.tree_util.tree_leaves(out)]
        log(f"[{time.time()-t0:6.1f}s] {name}: OK")
        return True
    except Exception as e:
        log(f"[{time.time()-t0:6.1f}s] {name}: FAIL {str(e)[:110]}")
        log("stopping (wedge avoidance)")
        sys.exit(1)


def main():
    from ofdm_uhd_tpu.core.spec import config
    from ofdm_uhd_tpu.phy import bits as PB, qam as PQ, frame as PF
    from ofdm_uhd_tpu.pipeline.tx import _encode

    log("devices:", jax.devices())
    spec = config("c1")
    rng = np.random.default_rng(0)
    B = 32
    p = rng.integers(0, 2, (B, spec.payload_bits_per_frame)).astype(np.uint8)
    coded_np = rng.integers(0, 2, (B, spec.coded_bits_per_frame)).astype(np.uint8)
    grid_np = (rng.standard_normal((B, spec.n_syms, spec.n_sc))
               + 1j * rng.standard_normal((B, spec.n_syms, spec.n_sc))
               ).astype(np.complex64)
    data_np = (rng.standard_normal((B, spec.n_data_syms, spec.n_data_sc))
               + 1j * rng.standard_normal((B, spec.n_data_syms, spec.n_data_sc))
               ).astype(np.complex64)

    stage("crc32", lambda: PB.crc32(p))
    stage("scramble", lambda: PB.scramble(p))
    stage("conv_encode", lambda: PB.conv_encode(p))
    stage("interleave", lambda: PB.interleave(coded_np, spec.coded_bits_per_sym))
    stage("encode_full", lambda: _encode(spec, p))
    stage("qam_map", lambda: PQ.qam_map(coded_np, spec.modulation))
    stage("build_grid", lambda: PF.build_grid(spec, data_np))
    stage("ifft_b32", lambda: jnp.fft.ifft(grid_np, norm="ortho"))
    stage("modulate", lambda: PF.ofdm_modulate(spec, grid_np))
    from ofdm_uhd_tpu.pipeline.tx import _tx_step
    stage("tx_full_b32", lambda: _tx_step(spec, p))
    # and batch 4 for comparison
    stage("tx_full_b4", lambda: _tx_step(spec, p[:4]))
    log("ALL OK")


if __name__ == "__main__":
    main()
