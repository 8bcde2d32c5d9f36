"""Probe 2: separate compute-size from transfer-size limits on axon.

Findings so far (scripts/tpu_probe_transfer.py, tpu_session2.log):
  - complex64 device->host fetch fails at ANY size (even 16 elements);
  - f32/i32/u8/bool fetches up to ~140 KB work;
  - planar f32 fetch of a [2,32,5760] stack (1.5 MB) FAILED -> either an
    f32 transfer-size limit or a compute limit on the stack kernel.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_probe_fetch2.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


FAILS = 0


def stage(name, fn, fatal=False, max_fails=4):
    global FAILS
    t0 = time.time()
    try:
        out = fn()
        log(f"[{time.time()-t0:6.1f}s] {name}: OK")
        return out
    except Exception as e:
        FAILS += 1
        log(f"[{time.time()-t0:6.1f}s] {name}: FAIL {type(e).__name__} "
            f"{str(e)[:110]}")
        if fatal or FAILS >= max_fails:
            log("stopping (wedge avoidance)")
            sys.exit(1)
        return None


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)

    stage("warmup", lambda: np.asarray(jax.jit(lambda v: v + 1)(
        jnp.arange(64.0))), fatal=True)

    # A. big-array COMPUTE with scalar fetch: proves compute isn't the limit
    big = rng.standard_normal((2, 32, 5760)).astype(np.float32)
    stage("compute_2x32x5760_scalar_fetch",
          lambda: float(jax.jit(lambda v: (v * 2).sum())(big)))

    # B. f32 transfer-size ladder (device-computed arrays)
    for n in (16384, 32768, 65536, 131072, 262144, 524288, 1048576):
        def t(n=n):
            d = jax.jit(lambda v: v * 1)(jnp.zeros((n,), jnp.float32))
            h = np.asarray(d)
            assert h.shape == (n,)
        r = stage(f"fetch_f32[{n}] ({n*4//1024}KB)", t)
        if r is None:
            break

    # C. planar fetch, small complex first
    def planar(shape):
        a = (rng.standard_normal(shape)
             + 1j * rng.standard_normal(shape)).astype(np.complex64)
        dev = jax.jit(lambda v: v * 1)(a)
        pair = jax.jit(lambda v: jnp.stack([jnp.real(v), jnp.imag(v)]))(dev)
        h = np.asarray(pair)
        assert np.allclose(h[0] + 1j * h[1], a, atol=1e-6)

    stage("planar_c64_16", lambda: planar((16,)))
    stage("planar_c64_4x576", lambda: planar((4, 576)))
    stage("planar_c64_32x576", lambda: planar((32, 576)))

    # D. chunked fetch: per-64KB slices via device-side slicing
    def chunked(n_elem, chunk=16384):
        dev = jax.jit(lambda v: v * 1)(jnp.arange(n_elem, dtype=jnp.float32))
        sl = jax.jit(lambda v, i: jax.lax.dynamic_slice(v, (i,), (chunk,)))
        parts = [np.asarray(sl(dev, i)) for i in range(0, n_elem, chunk)]
        h = np.concatenate(parts)[:n_elem]
        assert np.array_equal(h, np.arange(n_elem, dtype=np.float32))

    stage("chunked_f32_1M", lambda: chunked(1048576))
    log("done")


if __name__ == "__main__":
    main()
