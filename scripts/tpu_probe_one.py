"""One experiment per process (axon failures poison the session, so only
the FIRST failure in a process is a trustworthy signal).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/tpu_probe_one.py <experiment>
Prints 'RESULT <name> OK|FAIL <err>' on stderr; exit 0 on OK.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main(name):
    rng = np.random.default_rng(0)
    t0 = time.time()
    # warmup (known-good): f32 jit + small fetch
    np.asarray(jax.jit(lambda v: v + 1)(jnp.arange(64.0)))
    warm = time.time() - t0

    host_c = (rng.standard_normal(576) + 1j * rng.standard_normal(576)
              ).astype(np.complex64)

    def planar1():
        # host complex -> ONE jit -> f32 stack -> fetch
        pair = jax.jit(lambda v: jnp.stack([jnp.real(v), jnp.imag(v)]))(host_c)
        h = np.asarray(pair)
        assert np.allclose(h[0] + 1j * h[1], host_c)

    def planar2():
        # device complex (executable output) -> second jit -> f32 -> fetch
        dev = jax.jit(lambda v: v * 1)(host_c)
        pair = jax.jit(lambda v: jnp.stack([jnp.real(v), jnp.imag(v)]))(dev)
        h = np.asarray(pair)
        assert np.allclose(h[0] + 1j * h[1], host_c)

    def chain_c64():
        # device complex fed into a second executable, scalar f32 out
        dev = jax.jit(lambda v: v * 2)(host_c)
        s = float(jax.jit(lambda v: jnp.abs(v).sum())(dev))
        assert s > 0

    def devput_c64():
        # explicit device_put of complex, then compute + f32 fetch
        dev = jax.device_put(host_c)
        s = float(jax.jit(lambda v: jnp.abs(v).sum())(dev))
        assert s > 0

    def f32_256k():
        d = jax.jit(lambda v: v * 1)(jnp.zeros((65536,), jnp.float32))
        assert np.asarray(d).shape == (65536,)

    def f32_1p5m():
        d = jax.jit(lambda v: v * 1)(jnp.zeros((368640,), jnp.float32))
        assert np.asarray(d).shape == (368640,)

    def f32_4m():
        d = jax.jit(lambda v: v * 1)(jnp.zeros((1048576,), jnp.float32))
        assert np.asarray(d).shape == (1048576,)

    def arange_1m():
        d = jnp.arange(1048576, dtype=jnp.float32)
        s = float(jax.jit(lambda v: v.sum())(d))
        assert s > 0

    def fetch_c64():
        dev = jax.jit(lambda v: v * 1)(host_c)
        np.asarray(dev)


    def small_abs_576():
        s = np.asarray(jax.jit(lambda v: jnp.abs(v) ** 2)(host_c))
        assert s.shape == (576,)

    def small_abs_2048():
        c = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)
             ).astype(np.complex64)
        s = np.asarray(jax.jit(lambda v: jnp.abs(v) ** 2)(c))
        assert s.shape == (2048,)

    def chain_c64_32k():
        c = (rng.standard_normal(32768) + 1j * rng.standard_normal(32768)
             ).astype(np.complex64)
        dev = jax.jit(lambda v: v * 2)(c)
        s = float(jax.jit(lambda v: jnp.abs(v).sum())(dev))
        assert s > 0

    def devput_c64_32k():
        c = (rng.standard_normal(32768) + 1j * rng.standard_normal(32768)
             ).astype(np.complex64)
        dev = jax.device_put(c)
        s = float(jax.jit(lambda v: jnp.abs(v).sum())(dev))
        assert s > 0


    def small_abs_4096():
        c = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
             ).astype(np.complex64)
        s = np.asarray(jax.jit(lambda v: jnp.abs(v) ** 2)(c))
        assert s.shape == (4096,)

    def planar_arg_4096():
        # planar f32 in, complex inside, planar f32 out — the boundary rule
        c = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
             ).astype(np.complex64)
        pair = np.stack([c.real, c.imag])
        def f(p):
            v = p[0] + 1j * p[1]
            w = v * jnp.exp(1j * 0.1) * 2.0
            return jnp.stack([jnp.real(w), jnp.imag(w)])
        h = np.asarray(jax.jit(f)(pair))
        assert np.allclose(h[0] + 1j * h[1], c * np.exp(1j*0.1) * 2, atol=1e-5)

    def planar_chain_4096():
        # planar executable output -> next executable input (all f32)
        c = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
             ).astype(np.complex64)
        pair = np.stack([c.real, c.imag])
        f1 = jax.jit(lambda p: jnp.stack([p[0] - p[1], p[0] + p[1]]))
        f2 = jax.jit(lambda p: jnp.abs(p[0] + 1j * p[1]).sum())
        s = float(f2(f1(pair)))
        assert s > 0

    exps = dict(planar1=planar1, planar2=planar2, chain_c64=chain_c64,
                devput_c64=devput_c64, f32_256k=f32_256k, f32_1p5m=f32_1p5m,
                f32_4m=f32_4m, arange_1m=arange_1m, fetch_c64=fetch_c64,
                small_abs_576=small_abs_576, small_abs_2048=small_abs_2048,
                chain_c64_32k=chain_c64_32k, devput_c64_32k=devput_c64_32k,
                small_abs_4096=small_abs_4096, planar_arg_4096=planar_arg_4096,
                planar_chain_4096=planar_chain_4096)
    t1 = time.time()
    try:
        exps[name]()
        print(f"RESULT {name} OK (warm {warm:.0f}s, run {time.time()-t1:.1f}s)",
              file=sys.stderr, flush=True)
    except Exception as e:
        print(f"RESULT {name} FAIL {type(e).__name__} {str(e)[:110]} "
              f"(warm {warm:.0f}s)", file=sys.stderr, flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1])
