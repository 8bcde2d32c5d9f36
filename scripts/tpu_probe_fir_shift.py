"""Probe: where does fir_shift_pallas stop compiling on-chip? (r4)

Binary-search the unrolled tap count; also try a variant that builds the
shift window once and accumulates via pltpu.roll instead of 97 static
misaligned slices.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from ofdm_uhd_tpu.research.pallas_shift import fir_shift_pallas
from ofdm_uhd_tpu.kernels import conv_backend as CB

rng = np.random.default_rng(0)
x = (rng.normal(size=(1 << 16,)) + 1j * rng.normal(size=(1 << 16,))).astype(np.complex64)

for nt in (13, 25, 49, 73, 97):
    taps = np.hanning(nt).astype(np.float32); taps /= taps.sum()
    try:
        got = np.asarray(jax.jit(lambda v: fir_shift_pallas(v, taps))(x))
        ref = np.asarray(CB.fir_same(x, taps))
        err = float(np.max(np.abs(got - ref)))
        print(f"nt={nt}: OK maxerr={err:.2e}", flush=True)
    except Exception as e:
        print(f"nt={nt}: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)
        break
