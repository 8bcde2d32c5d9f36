"""Decisive axon probe: D2H transfer size limits vs compute failures.

Each stage has a hard SIGALRM timeout so a wedged device can't hang the
process; first failure stops the run (wedge avoidance).
"""

import signal
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class Timeout(Exception):
    pass


def _alarm(sig, frm):
    raise Timeout()


signal.signal(signal.SIGALRM, _alarm)


def stage(name, fn, materialize=True, budget=240):
    t0 = time.time()
    signal.alarm(budget)
    try:
        out = jax.block_until_ready(jax.jit(fn)() if callable(fn) else fn)
        if materialize:
            _ = [np.asarray(x) for x in jax.tree_util.tree_leaves(out)]
        signal.alarm(0)
        log(f"[{time.time()-t0:6.1f}s] {name}: OK")
        return out
    except Timeout:
        log(f"[{time.time()-t0:6.1f}s] {name}: TIMEOUT")
        sys.exit(1)
    except Exception as e:
        signal.alarm(0)
        log(f"[{time.time()-t0:6.1f}s] {name}: FAIL {str(e)[:110]}")
        log("stopping (wedge avoidance)")
        sys.exit(1)


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)

    stage("sanity", lambda: jnp.arange(8.0) + 1.0, budget=300)

    # 1. f32 1-D transfer ramp
    for n in (16384, 32768, 34756, 40960, 65536, 131072, 262144):
        x = rng.standard_normal(n).astype(np.float32)
        stage(f"f32_1d[{n}]({4*n//1024}KB)",
              lambda x=x: jax.jit(lambda v: v + 1.0)(x))

    # 2. c64 1-D ramp
    for n in (8192, 16384, 18432, 32768, 131072):
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64)
        stage(f"c64_1d[{n}]({8*n//1024}KB)",
              lambda x=x: jax.jit(lambda v: v * (1.0 + 0j))(x))

    # 3. 2-D shapes
    x = rng.standard_normal((32, 1152)).astype(np.float32)
    stage("f32_2d[32x1152]", lambda x=x: jax.jit(lambda v: v + 1.0)(x))
    xc = (rng.standard_normal((32, 576)) + 1j * rng.standard_normal((32, 576))
          ).astype(np.complex64)
    stage("c64_2d[32x576]", lambda xc=xc: jax.jit(lambda v: v * (1 + 0j))(xc))

    # 4. qam_map compute vs transfer
    from ofdm_uhd_tpu.phy import qam as PQ
    bits32 = rng.integers(0, 2, (32, 1152)).astype(np.uint8)
    f = jax.jit(lambda b: PQ.qam_map(b, "qpsk"))
    stage("qam_map_b32_compute_only", lambda: f(bits32), materialize=False)
    stage("qam_map_b32_materialize", lambda: f(bits32))

    # 5. full tx
    from ofdm_uhd_tpu.core.spec import config
    from ofdm_uhd_tpu.pipeline.tx import _tx_step
    spec = config("c1")
    p32 = rng.integers(0, 2, (32, spec.payload_bits_per_frame)).astype(np.uint8)
    ftx = jax.jit(lambda p: _tx_step(spec, p))
    stage("tx_b32_compute_only", lambda: ftx(p32), materialize=False)
    out = stage("tx_b32_materialize", lambda: ftx(p32))

    # 6. full rx
    from ofdm_uhd_tpu.pipeline.rx import _rx_aligned
    frames = np.asarray(out).astype(np.complex64)
    frx = jax.jit(lambda fr: _rx_aligned(spec, 0, fr))
    stage("rx_b32_compute_only", lambda: frx(frames), materialize=False)
    o = stage("rx_b32_materialize", lambda: frx(frames))
    log("crc:", int(np.asarray(o["crc_ok"]).sum()), "/ 32")
    log("ALL OK")


if __name__ == "__main__":
    main()
