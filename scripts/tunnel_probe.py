"""Isolate the axon tunnel's dispatch/arg-handling costs from compute.

Times a TRIVIAL op (x*1.000001 -> sum) over different input shapes and
call patterns to answer:
  1. does per-dispatch cost scale with arg size (args re-shipped per call)?
  2. does calling with a rotating set of distinct buffers cost more than
     re-calling with one buffer (lazy upload / result caching)?
  3. does block_until_ready actually wait (vs fetch-forced timing)?
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from ofdm_uhd_tpu.core.boundary import device_put_planar, jit_planar

    log(f"# device={jax.devices()[0].device_kind}")

    @jit_planar
    def tiny(c):
        return jnp.sum(jnp.abs(c) ** 2)

    def run(name, shape, k=3, iters=6, force=True):
        rng = np.random.default_rng(0)
        base = (rng.normal(size=shape) + 1j * rng.normal(size=shape)
                ).astype(np.complex64)
        xs = [device_put_planar(base * np.float32(1 + 1e-6 * i))
              for i in range(k)]
        out = tiny(xs[0])
        np.asarray(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = tiny(xs[i % k])
        if force:
            np.asarray(out)
        else:
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        log(f"# {name:<28} {dt*1e3:8.2f} ms/iter")

    n = 554_596
    run("tiny(554k) rotating3 fetch", (n,), k=3)
    run("tiny(554k) same-buf fetch", (n,), k=1)
    run("tiny(554k) same-buf block", (n,), k=1, force=False)
    run("tiny(4x554k) rotating3", (4, n), k=3)
    run("tiny(130x4032) rotating3", (130, 4032), k=3)
    run("tiny(8k) rotating3", (8192,), k=3)

    # does a second fetch of the same result cost anything?
    x = device_put_planar(np.ones(n, np.complex64))
    out = tiny(x)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(6):
        np.asarray(out)
    log(f"# refetch same result         {(time.perf_counter()-t0)/6*1e3:8.2f} ms/iter")

    # dispatch-only latency: chain of 20 dependent tiny ops on small data
    @jit_planar
    def chain(c):
        for _ in range(20):
            c = c * jnp.float32(1.0000001)
        return jnp.sum(jnp.abs(c))
    s = device_put_planar(np.ones(256, np.complex64))
    np.asarray(chain(s))
    t0 = time.perf_counter()
    for _ in range(6):
        out = chain(s)
    np.asarray(out)
    log(f"# chain20(256) same-buf       {(time.perf_counter()-t0)/6*1e3:8.2f} ms/iter")


if __name__ == "__main__":
    main()
