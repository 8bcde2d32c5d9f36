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

* N = 1024 — the SAME direct matmul, column-blocked over the grid:
  Y[:, j*C:(j+1)*C] = X @ F^T[:, j*C:(j+1)*C] with C = 256, so each grid
  cell holds a [TB, N] input tile plus a [N, C] DFT slab in VMEM (~3 MB
  with both planes) instead of the full 8 MB matrix. A four-step
  Cooley-Tukey variant (stage-1/stage-2 32-point DFT matmuls with VMEM
  transposes) was tried first and REJECTED on hardware: the in-register
  [TB, 1024] -> [TB, 32, 32] reshape is an "unsupported shape cast" in
  this Mosaic backend (and the fused variant exceeded its VMEM budget).
  The O(N^2) FLOP premium is irrelevant here: at 8·N MAC/point the MXU
  roofline is ~Gsamples/s, two decades above the chain's line rate, and
  the op stays HBM-bound.

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


def _cdot(ar, ai, br, bi):
    # precision=HIGHEST: the MXU's default bf16 passes cost the FFT ~1e-2
    # max error at N=64 (measured on-chip, tpu_session5.log); the 3-pass
    # f32 emulation restores ~1e-6 and the op stays HBM-bound regardless.
    #
    # KARATSUBA complex product (VERDICT r2 item 4): 3 matmuls instead of
    # 4 — re = t1 - t2, im = t3 - t1 - t2 with t3 = (ar+ai)(br+bi) —
    # saves 25% of the MXU passes (9 vs 12 after the 3-pass f32
    # emulation), where the direct-DFT kernel's time actually goes at
    # N >= 256. The extra cancellation costs ~1 ulp of rounding, orders
    # below the chain's f32 EVM floor (equality tests gate it).
    mm = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    t1 = mm(ar, br)
    t2 = mm(ai, bi)
    t3 = mm(ar + ai, br + bi)
    return t1 - t2, t3 - t1 - t2


def _direct_kernel(xr, xi, fr, fi, yr, yi):
    rr, ii = _cdot(xr[:], xi[:], fr[:], fi[:])
    yr[:] = rr
    yi[:] = ii


@functools.lru_cache(maxsize=32)
def _build_fft(n: int, inverse: bool, tb: int):
    """Compiled pallas_call for one (N, direction, tile) combination."""
    vmem = pltpu.VMEM
    fr, fi = _dft_mats(n, inverse)
    nc = n if n <= 512 else 256          # DFT-matrix column tile (VMEM bound)
    const_spec = pl.BlockSpec((n, nc), lambda i, j: (0, j), memory_space=vmem)
    in_spec = pl.BlockSpec((tb, n), lambda i, j: (i, 0), memory_space=vmem)
    out_spec = pl.BlockSpec((tb, nc), lambda i, j: (i, j), memory_space=vmem)

    def run(xr, xi):
        b = xr.shape[0]
        grid = (b // tb, n // nc)
        return pl.pallas_call(
            _direct_kernel,
            grid=grid,
            in_specs=[in_spec, in_spec, const_spec, const_spec],
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((b, n), jnp.float32),
                       jax.ShapeDtypeStruct((b, n), jnp.float32)),
            interpret=_interpret(),
        )(xr, xi, jnp.asarray(fr), jnp.asarray(fi))

    return run


@functools.lru_cache(maxsize=32)
def _build_fused(n: int, inverse: bool, tb: int, in_len: int, start: int,
                 cp_out: int):
    """Direct-DFT matmul with the CP handling FUSED INTO THE MATRIX.

    Two fusions (never combined), both avoiding a separate HBM copy pass
    and any lane-dim slice lowering inside the kernel:

    * CP STRIP + FFT (in_len > n): Y = X[:, start:start+n] @ F^T becomes
      Y = X @ G with G [in_len, n] zero except rows start..start+n-1 = F^T
      — the slice vanishes into zero rows, the kernel reads the raw
      [tb, sym_len] symbol rows straight from HBM (XLA's fft custom-call
      needs a materialized contiguous copy of the stripped window).
    * IFFT + CP ADD (cp_out > 0): Y = [x[..., -cp:], x] becomes
      Y = X @ [F^T[:, n-cp:], F^T], one [tb, n+cp] output row per symbol
      with no concat pass.

    The MXU premium (in_len/n or (n+cp)/n, ~1.1x) is noise next to the
    saved HBM round trip. n <= 512 only (the [*, 1024]-wide block Mosaic
    wall, module docstring).
    """
    assert n <= 512, "fused CP variants cover n <= 512 (Mosaic block wall)"
    assert in_len % 8 == 0, "sublane constraint on the fused DFT matrix"
    vmem = pltpu.VMEM
    fr, fi = _dft_mats(n, inverse)
    if in_len != n:
        g = np.zeros((2, in_len, n), np.float32)
        g[0, start:start + n] = fr
        g[1, start:start + n] = fi
        gr, gi = g[0], g[1]
        out_n = n
    else:
        gr, gi = fr, fi
        out_n = n + cp_out
        if cp_out:
            gr = np.concatenate([fr[:, n - cp_out:], fr], axis=1)
            gi = np.concatenate([fi[:, n - cp_out:], fi], axis=1)
    const_spec = pl.BlockSpec((in_len, out_n), lambda i: (0, 0),
                              memory_space=vmem)
    in_spec = pl.BlockSpec((tb, in_len), lambda i: (i, 0), memory_space=vmem)
    out_spec = pl.BlockSpec((tb, out_n), lambda i: (i, 0), memory_space=vmem)

    def run(xr, xi):
        b = xr.shape[0]
        return pl.pallas_call(
            _direct_kernel,
            grid=(b // tb,),
            in_specs=[in_spec, in_spec, const_spec, const_spec],
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((b, out_n), jnp.float32),
                       jax.ShapeDtypeStruct((b, out_n), jnp.float32)),
            interpret=_interpret(),
        )(xr, xi, jnp.asarray(gr), jnp.asarray(gi))

    return run


def _run_tiled(build, x, out_n: int, tile: int):
    """Flatten batch, pad to the row tile, run, unpad/reshape."""
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
    yr, yi = build(tb)(xr, xi)
    out = (yr + 1j * yi).astype(jnp.complex64)
    if pad:
        out = out[:b]
    return out.reshape(batch_shape + (out_n,))


def fft_pallas(x: jax.Array, inverse: bool = False, tile: int = 128) -> jax.Array:
    """Batched ortho FFT/IFFT along the last axis, complex64 in/out."""
    n = x.shape[-1]
    return _run_tiled(lambda tb: _build_fft(n, inverse, tb), x, n, tile)


def cp_strip_fft_pallas(x: jax.Array, start: int, n: int,
                        tile: int = 128) -> jax.Array:
    """[..., in_len] symbol rows -> ortho FFT of [..., start:start+n].

    The RX CP strip fused into the DFT matrix (see _build_fused) — one
    kernel reads raw symbol rows and writes the grid.
    """
    in_len = x.shape[-1]
    assert start + n <= in_len
    return _run_tiled(
        lambda tb: _build_fused(n, False, tb, in_len, start, 0), x, n, tile)


def ifft_cp_pallas(x: jax.Array, cp: int, tile: int = 128) -> jax.Array:
    """[..., n] grid rows -> ortho IFFT with the CP prepended: [..., n+cp].

    The TX CP insertion fused into the DFT matrix (see _build_fused).
    """
    n = x.shape[-1]
    return _run_tiled(
        lambda tb: _build_fused(n, True, tb, n, 0, cp), x, n + cp, tile)
