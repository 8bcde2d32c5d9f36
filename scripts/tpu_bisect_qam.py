"""Micro-bisect of qam_map internals on the axon TPU."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def stage(name, fn, *args):
    t0 = time.time()
    try:
        out = jax.block_until_ready(jax.jit(fn)(*args))
        _ = [np.asarray(x) for x in jax.tree_util.tree_leaves(out)]
        log(f"[{time.time()-t0:6.1f}s] {name}: OK")
        return True
    except Exception as e:
        log(f"[{time.time()-t0:6.1f}s] {name}: FAIL {str(e)[:110]}")
        log("stopping (wedge avoidance)")
        sys.exit(1)


def main():
    from ofdm_uhd_tpu.core.spec import config
    from ofdm_uhd_tpu.phy import qam as PQ, frame as PF

    log("devices:", jax.devices())
    spec = config("c1")
    rng = np.random.default_rng(0)
    bits32 = rng.integers(0, 2, (32, 1152)).astype(np.uint8)
    bits4 = bits32[:4]
    f32 = rng.standard_normal((32, 576)).astype(np.float32)

    stage("reshape_astype", lambda b: b.reshape(32, 576, 2).astype(jnp.float32), bits32)
    stage("sign", lambda b: 2.0 * b.reshape(32, 576, 2).astype(jnp.float32) - 1.0, bits32)
    stage("complex_construct_b32", lambda r: (r + 1j * r).astype(jnp.complex64), f32)
    stage("complex_construct_b4", lambda r: (r + 1j * r).astype(jnp.complex64), f32[:4])
    stage("qam_map_b4", lambda b: PQ.qam_map(b, "qpsk"), bits4)
    stage("qam_map_b32", lambda b: PQ.qam_map(b, "qpsk"), bits32)
    data32 = (rng.standard_normal((32, spec.n_data_syms, spec.n_data_sc))
              + 1j * rng.standard_normal((32, spec.n_data_syms, spec.n_data_sc))
              ).astype(np.complex64)
    stage("build_grid_b32", lambda d: PF.build_grid(spec, d), data32)
    grid32 = (rng.standard_normal((32, spec.n_syms, spec.n_sc))
              + 1j * rng.standard_normal((32, spec.n_syms, spec.n_sc))
              ).astype(np.complex64)
    stage("ifft_b32", lambda g: jnp.fft.ifft(g, norm="ortho"), grid32)
    stage("modulate_b32", lambda g: PF.ofdm_modulate(spec, g), grid32)
    from ofdm_uhd_tpu.pipeline.tx import _tx_step
    p32 = rng.integers(0, 2, (32, spec.payload_bits_per_frame)).astype(np.uint8)
    stage("tx_full_b32", lambda p: _tx_step(spec, p), p32)
    from ofdm_uhd_tpu.pipeline.rx import _rx_aligned
    frames = np.asarray(jax.jit(lambda p: _tx_step(spec, p))(p32))
    stage("rx_full_b32", lambda f: _rx_aligned(spec, 0, f), frames.astype(np.complex64))
    log("ALL OK")


if __name__ == "__main__":
    main()
