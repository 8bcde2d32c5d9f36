"""Schmidl-Cox sliding correlation kernel (K3) — backend dispatch.

Replaces the reference-class per-sample C++ correlator hot loop
(SURVEY.md §2.2-K3; mount empty, §0). Computes, for each lag d:

    P(d) = sum_{m=0}^{L-1} conj(r[d+m]) * r[d+m+L]
    R(d) = 0.5 * sum_{m=0}^{2L-1} |r[d+m]|^2

XLA backend: the windowed sums are boxcar (ones-kernel) convolutions of the
lag product s[n] = conj(r[n])*r[n+L] and the energy |r|^2 — NOT prefix-sum
differences: long f32 cumsums lose precision, and this environment's TPU
backend does not implement the large-N cumsum lowering at all. The conv
form is also the shape the Pallas kernel (M3) takes.

Golden twin: golden.sync.sc_metric (float64 cumsum form).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _moving_sum(x: jax.Array, win: int) -> jax.Array:
    """Valid-mode boxcar: y[..., d] = sum_{m<win} x[..., d+m], len n-win+1."""
    shape = x.shape
    flat = x.reshape(-1, 1, shape[-1]).astype(jnp.float32)
    k = jnp.ones((1, 1, win), dtype=jnp.float32)
    y = jax.lax.conv_general_dilated(
        flat, k, window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    return y[:, 0, :].reshape(shape[:-1] + (-1,))


def sc_correlate(r: jax.Array, l: int, backend: str = "xla"
                 ) -> tuple[jax.Array, jax.Array]:
    """r [..., n] complex -> (P [..., nd], R [..., nd]), nd = n - 2l + 1."""
    if backend == "pallas":
        from .pallas_sync import sc_correlate_pallas
        return sc_correlate_pallas(r, l)
    prod = jnp.conj(r[..., :-l]) * r[..., l:]        # s[n], length n-l
    p_re = _moving_sum(jnp.real(prod), l)            # [..., nd]
    p_im = _moving_sum(jnp.imag(prod), l)
    e = jnp.abs(r) ** 2
    rr = 0.5 * _moving_sum(e, 2 * l)                 # [..., nd]
    p = (p_re + 1j * p_im).astype(jnp.complex64)
    return p, rr


def sc_metric(p: jax.Array, rr: jax.Array, eps: float = 1e-12) -> jax.Array:
    """M(d) = |P|^2 / R^2 with zero where R ~ 0 (idle input)."""
    m = jnp.abs(p) ** 2 / jnp.maximum(rr, eps) ** 2
    return jnp.where(rr > eps, m, 0.0)
