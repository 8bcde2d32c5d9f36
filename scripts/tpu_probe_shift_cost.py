"""Micro-probe: what costs what in the shifted-FMA kernels? (r4)

Slope-timed (floor-free) pallas variants on [64, C] f32 blocks:
  taps-N     N slice-FMAs at misaligned offsets (the core construct)
  aligned-N  N FMAs at offset 0 (no lane shift) — isolates shift cost
  reduce     taps-13 + sublane [8,8,C]-reduce (decim's extra)
  bcast      taps-13 on sublane-broadcast rows (interp/fir-phased extra)
  fori       taps-13 inside a fori_loop over 8 phases (fir-phased's loop)
Each at C in {2048, 8192} and grid steps for a fixed 8 MB total workload,
so per-step overhead vs per-op cost separates.
"""
import sys, os, functools, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 64
TOT_BYTES = 8 << 20

def mk(c, body, n_out_rows=None):
    nr = n_out_rows or ROWS
    cols_tot = TOT_BYTES // (ROWS * 4)
    steps = cols_tot // c
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(ROWS, steps * c + 256)).astype(np.float32))
    spec = pl.BlockSpec((ROWS, c), lambda j: (0, j), memory_space=pltpu.VMEM)
    spec_h = pl.BlockSpec((ROWS, 256), lambda j: (0, (j + 1) * (c // 256)),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((nr, c), lambda j: (0, j), memory_space=pltpu.VMEM)
    def f(xx):
        return pl.pallas_call(
            body, grid=(steps,), in_specs=[spec, spec_h], out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((nr, steps * c), jnp.float32),
        )(xx, xx)
    return f, x, steps

def slope_time(f, x, reps_hi=256, reps_lo=16):
    def loop(xx, reps):
        def b(i, carry):
            y = f(xx * (1.0 + 1e-9 * carry))
            return carry + jnp.sum(y.ravel()[:8])
        return jax.lax.fori_loop(0, reps, b, jnp.float32(0))
    jl = jax.jit(loop)
    lo, hi = jnp.int32(reps_lo), jnp.int32(reps_hi)
    np.asarray(jl(x, lo)); np.asarray(jl(x, hi))
    t0 = time.perf_counter(); np.asarray(jl(x, lo)); d_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(jl(x, hi)); d_hi = time.perf_counter() - t0
    return (d_hi - d_lo) / (reps_hi - reps_lo)

def taps_kernel(nt, aligned, x_ref, h_ref, y_ref):
    xw = jnp.concatenate([x_ref[:], h_ref[:]], axis=1)
    c = y_ref.shape[1]
    acc = 0.01 * xw[:, 0:c]
    for t in range(1, nt):
        o = 0 if aligned else t
        acc = acc + (0.01 + 0.001 * t) * xw[:, o:o + c]
    y_ref[:] = acc

def reduce_kernel(nt, x_ref, h_ref, y_ref):
    xw = jnp.concatenate([x_ref[:], h_ref[:]], axis=1)
    c = y_ref.shape[1]
    acc = 0.01 * xw[:, 0:c]
    for t in range(1, nt):
        acc = acc + (0.01 + 0.001 * t) * xw[:, t:t + c]
    red = jnp.sum(acc.reshape(8, 8, c), axis=1)
    y_ref[:] = jnp.pad(red, ((0, y_ref.shape[0] - 8), (0, 0)))

def bcast_kernel(nt, x_ref, h_ref, y_ref):
    xw = jnp.concatenate([x_ref[:], h_ref[:]], axis=1)
    c = y_ref.shape[1]
    xb = jnp.concatenate(
        [jnp.broadcast_to(xw[p:p + 1], (8, xw.shape[1])) for p in range(8)],
        axis=0)
    acc = 0.01 * xb[:, 0:c]
    for t in range(1, nt):
        acc = acc + (0.01 + 0.001 * t) * xb[:, t:t + c]
    y_ref[:] = acc

def fori_kernel(nt, x_ref, h_ref, y_ref, acc_scr):
    c = y_ref.shape[1]
    acc_scr[:] = jnp.zeros_like(acc_scr)
    def body(p, _):
        xa = jnp.concatenate([x_ref[p, :], h_ref[p, :]])
        xb = jnp.broadcast_to(xa[None, :], (ROWS, xa.shape[0]))
        part = 0.01 * xb[:, 0:c]
        for t in range(1, nt):
            part = part + (0.01 + 0.001 * t) * xb[:, t:t + c]
        acc_scr[:] += part
        return 0
    jax.lax.fori_loop(0, 8, body, 0)
    y_ref[:] = acc_scr[:]

for c in (2048, 8192):
    for name, body, nr in (
        ("taps-2", functools.partial(taps_kernel, 2, False), None),
        ("taps-13", functools.partial(taps_kernel, 13, False), None),
        ("taps-25", functools.partial(taps_kernel, 25, False), None),
        ("align-25", functools.partial(taps_kernel, 25, True), None),
        ("reduce-13", functools.partial(reduce_kernel, 13), None),
        ("bcast-13", functools.partial(bcast_kernel, 13), None),
    ):
        try:
            f, x, steps = mk(c, body, nr)
            dt = slope_time(f, x)
            print(f"C={c} {name:<10} steps={steps:<3} net={dt*1e6:8.1f} us "
                  f"({dt/steps*1e6:6.2f} us/step)", flush=True)
        except Exception as e:
            print(f"C={c} {name:<10} FAIL {type(e).__name__} {str(e)[:80]}", flush=True)
    # fori needs scratch
    try:
        cols_tot = TOT_BYTES // (ROWS * 4); steps = cols_tot // c
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(ROWS, steps * c + 256)).astype(np.float32))
        spec = pl.BlockSpec((ROWS, c), lambda j: (0, j), memory_space=pltpu.VMEM)
        spec_h = pl.BlockSpec((ROWS, 256), lambda j: (0, (j + 1) * (c // 256)),
                              memory_space=pltpu.VMEM)
        def f(xx):
            return pl.pallas_call(
                functools.partial(fori_kernel, 13),
                grid=(steps,), in_specs=[spec, spec_h], out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((ROWS, steps * c), jnp.float32),
                scratch_shapes=[pltpu.VMEM((ROWS, c), jnp.float32)],
            )(xx, xx)
        dt = slope_time(f, x)
        print(f"C={c} fori-13    steps={steps:<3} net={dt*1e6:8.1f} us "
              f"({dt/steps*1e6:6.2f} us/step)", flush=True)
    except Exception as e:
        print(f"C={c} fori-13    FAIL {type(e).__name__} {str(e)[:80]}", flush=True)
