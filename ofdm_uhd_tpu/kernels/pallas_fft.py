"""K1: Pallas TPU batched FFT/IFFT — the MXU formulation.

Replaces the reference-class FFTW tier (SURVEY.md §2.2-K1; mount empty, §0)
with the TPU-native shape of the problem: a DFT is a matmul, and the MXU
does matmuls at speed-of-light. Complex data travels as separate (re, im)
f32 planes — Pallas TPU has no native complex dtype.

Two regimes (chosen by N, both norm='ortho'):

* N <= 512 — DIRECT dense DFT: Y = X @ F^T as four real [TB, N] @ [N, N]
  matmuls. At these sizes the extra O(N^2) FLOPs over radix FFT are far
  below the MXU roofline while the op stays HBM-bandwidth-bound — the
  matmul IS the fastest formulation, not a compromise.

* N = 1024 (any N = N1*N2 with N1 = N2 = 32) — four-step Cooley-Tukey
  inside one kernel: stage-1 32-point DFTs as a [TB*32, 32] @ [32, 32]
  matmul, twiddle multiply, stage-2 likewise, with the classic transposes
  done in VMEM. Derivation (n = N2*n1 + n2, k = k1 + N1*k2):
      X[k1 + N1*k2] = sum_{n2} W_N^{n2 k1} W_{N2}^{n2 k2}
                      * sum_{n1} x[N2*n1 + n2] W_{N1}^{n1 k1}

Batch is padded to the tile size TB and tiled over the grid. Equality vs
jnp.fft is asserted in tests/kernels/ (interpret mode on CPU, compiled on
TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _dft_mats(n: int, inverse: bool) -> tuple[np.ndarray, np.ndarray]:
    """F^T planes for Y = X @ F^T, ortho scaling."""
    k = np.arange(n)
    sign = 2j if inverse else -2j
    f = np.exp(sign * np.pi * np.outer(k, k) / n) / np.sqrt(n)
    ft = f.T  # symmetric, but keep the transpose explicit
    return ft.real.astype(np.float32), ft.imag.astype(np.float32)


def _four_step_mats(n1: int, n2: int, inverse: bool):
    sign = 2j if inverse else -2j
    n = n1 * n2
    a1 = np.arange(n1)
    f1 = np.exp(sign * np.pi * np.outer(a1, a1) / n1) / np.sqrt(n)  # ortho folded here
    a2 = np.arange(n2)
    f2 = np.exp(sign * np.pi * np.outer(a2, a2) / n2)
    tw = np.exp(sign * np.pi * np.outer(a2, a1) / n)                # W[n2, k1]
    out = {}
    out["f1t"] = (f1.T.real.astype(np.float32), f1.T.imag.astype(np.float32))
    out["f2"] = (f2.real.astype(np.float32), f2.imag.astype(np.float32))
    out["tw"] = (tw.real.astype(np.float32), tw.imag.astype(np.float32))
    return out


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cdot(ar, ai, br, bi):
    # precision=HIGHEST: the MXU's default bf16 passes cost the FFT ~1e-2
    # max error at N=64 (measured on-chip, tpu_session5.log); the 3-pass
    # f32 emulation restores ~1e-6 and the op stays HBM-bound regardless.
    mm = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    return mm(ar, br) - mm(ai, bi), mm(ar, bi) + mm(ai, br)


def _direct_kernel(xr, xi, fr, fi, yr, yi):
    rr, ii = _cdot(xr[:], xi[:], fr[:], fi[:])
    yr[:] = rr
    yi[:] = ii


def _four_step_kernel(n1: int, n2: int, tb: int,
                      xr, xi, f1r, f1i, twr, twi, f2r, f2i, yr, yi):
    # x [TB, N]: M[b, n1, n2] = x[b, N2*n1 + n2]
    def stage(ar):
        return ar.reshape(tb, n1, n2).transpose(0, 2, 1).reshape(tb * n2, n1)
    mr, mi = stage(xr[:]), stage(xi[:])
    # stage 1: rows (b, n2), contraction over n1 -> columns k1
    br_, bi_ = _cdot(mr, mi, f1r[:], f1i[:])                 # [TB*n2, n1->k1]
    br3 = br_.reshape(tb, n2, n1)
    bi3 = bi_.reshape(tb, n2, n1)
    cr, ci = _cmul(br3, bi3, twr[:][None], twi[:][None])     # twiddle [n2, k1]
    # stage 2: rows (b, k1), contraction over n2 -> columns k2
    cr2 = cr.transpose(0, 2, 1).reshape(tb * n1, n2)
    ci2 = ci.transpose(0, 2, 1).reshape(tb * n1, n2)
    xr2, xi2 = _cdot(cr2, ci2, f2r[:], f2i[:])               # [TB*k1, k2]
    # k = k1 + n1*k2  ->  out[b, k2, k1]
    yr[:] = xr2.reshape(tb, n1, n2).transpose(0, 2, 1).reshape(tb, n1 * n2)
    yi[:] = xi2.reshape(tb, n1, n2).transpose(0, 2, 1).reshape(tb, n1 * n2)


@functools.lru_cache(maxsize=32)
def _build_fft(n: int, inverse: bool, tb: int):
    """Compiled pallas_call for one (N, direction, tile) combination."""
    vmem = pltpu.VMEM
    if n <= 512:
        fr, fi = _dft_mats(n, inverse)
        consts = (fr, fi)
        kernel = _direct_kernel
        const_specs = [pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=vmem)] * 2
    else:
        n1 = 1 << ((n.bit_length() - 1) // 2)
        n2 = n // n1
        mats = _four_step_mats(n1, n2, inverse)
        consts = (*mats["f1t"], *mats["tw"], *mats["f2"])
        kernel = functools.partial(_four_step_kernel, n1, n2, tb)
        const_specs = [
            pl.BlockSpec((n1, n1), lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec((n1, n1), lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec((n2, n1), lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec((n2, n1), lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=vmem),
        ]

    data_spec = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=vmem)

    def run(xr, xi):
        b = xr.shape[0]
        grid = (b // tb,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[data_spec, data_spec, *const_specs],
            out_specs=(data_spec, data_spec),
            out_shape=(jax.ShapeDtypeStruct((b, n), jnp.float32),
                       jax.ShapeDtypeStruct((b, n), jnp.float32)),
            interpret=_interpret(),
        )(xr, xi, *[jnp.asarray(c) for c in consts])

    return run


def fft_pallas(x: jax.Array, inverse: bool = False, tile: int = 128) -> jax.Array:
    """Batched ortho FFT/IFFT along the last axis, complex64 in/out."""
    n = x.shape[-1]
    batch_shape = x.shape[:-1]
    flat = x.reshape(-1, n)
    b = flat.shape[0]
    tb = min(tile, max(8, 1 << (b - 1).bit_length())) if b else tile
    tb = min(tb, tile)
    pad = (-b) % tb
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, n), dtype=flat.dtype)], axis=0)
    xr = jnp.real(flat).astype(jnp.float32)
    xi = jnp.imag(flat).astype(jnp.float32)
    yr, yi = _build_fft(n, inverse, tb)(xr, xi)
    out = (yr + 1j * yi).astype(jnp.complex64)
    if pad:
        out = out[:b]
    return out.reshape(batch_shape + (n,))
