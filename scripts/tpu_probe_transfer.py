"""Probe: is device->host transfer of complex64 the UNIMPLEMENTED op?

Stages ordered small -> large, non-fatal where safe; each stage fetches to
host explicitly. The planar fetch (stack real/imag as f32 on device, fetch
f32, reassemble on host) is the candidate workaround.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_probe_transfer.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


FAILS = 0


def stage(name, fn, fatal=False):
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
        if fatal or FAILS >= 3:
            log("stopping (wedge avoidance)")
            sys.exit(1)
        return None


def planar_fetch(x):
    """complex device array -> host complex via two f32 planes."""
    pair = jax.jit(lambda v: jnp.stack([v.real, v.imag]))(x)
    h = np.asarray(pair)
    return h[0] + 1j * h[1]


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)

    x = jnp.arange(64.0)
    stage("warmup_f32", lambda: np.asarray(jax.jit(lambda v: v + 1)(x)),
          fatal=True)

    # dtype fetch matrix on a computed (device-resident) array
    def fetch(dtype, shape, via=np.asarray):
        a = rng.standard_normal(shape)
        if np.issubdtype(dtype, np.complexfloating):
            a = a + 1j * rng.standard_normal(shape)
        dev = jax.jit(lambda v: v * 1)(jnp.asarray(a.astype(dtype)))
        h = via(dev)
        assert np.allclose(h, a.astype(dtype), atol=1e-5)
        return True

    stage("fetch_bool_32", lambda: fetch(np.bool_, (32,)))
    stage("fetch_i32_32x576", lambda: fetch(np.int32, (32, 576)))
    stage("fetch_u8_32x576", lambda: fetch(np.uint8, (32, 576)))
    stage("fetch_c64_16", lambda: fetch(np.complex64, (16,)))
    stage("fetch_c64_4x576", lambda: fetch(np.complex64, (4, 576)))
    stage("fetch_c64_32x576", lambda: fetch(np.complex64, (32, 576)))
    stage("fetch_c64_planar_32x576",
          lambda: fetch(np.complex64, (32, 576), via=planar_fetch))
    stage("fetch_c64_planar_32x5760",
          lambda: fetch(np.complex64, (32, 5760), via=planar_fetch))
    log("done")


if __name__ == "__main__":
    main()
