"""Schmidl-Cox sliding correlation kernel (K3) — backend dispatch.

Replaces the reference-class per-sample C++ correlator hot loop
(SURVEY.md §2.2-K3; mount empty, §0). Computes, for each lag d:

    P(d) = sum_{m=0}^{L-1} conj(r[d+m]) * r[d+m+L]
    R(d) = 0.5 * sum_{m=0}^{2L-1} |r[d+m]|^2

XLA backend: O(n) cumulative sums (associative_scan-friendly, and exactly
the golden formulation). Pallas backend (M3): blocked shifted-product +
block-prefix sums in VMEM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sc_correlate(r: jax.Array, l: int, backend: str = "xla"
                 ) -> tuple[jax.Array, jax.Array]:
    """r [..., n] complex -> (P [..., nd], R [..., nd]), nd = n - 2l + 1."""
    if backend == "pallas":
        from .pallas_sync import sc_correlate_pallas
        return sc_correlate_pallas(r, l)
    n = r.shape[-1]
    nd = n - 2 * l + 1
    prod = jnp.conj(r[..., :-l]) * r[..., l:]
    e = jnp.abs(r) ** 2
    zero_c = jnp.zeros(r.shape[:-1] + (1,), dtype=prod.dtype)
    zero_r = jnp.zeros(r.shape[:-1] + (1,), dtype=e.dtype)
    cp = jnp.concatenate([zero_c, jnp.cumsum(prod, axis=-1)], axis=-1)
    ce = jnp.concatenate([zero_r, jnp.cumsum(e, axis=-1)], axis=-1)
    p = cp[..., l : l + nd] - cp[..., :nd]
    rr = 0.5 * (ce[..., 2 * l : 2 * l + nd] - ce[..., :nd])
    return p, rr


def sc_metric(p: jax.Array, rr: jax.Array, eps: float = 1e-12) -> jax.Array:
    """M(d) = |P|^2 / R^2 with zero where R ~ 0 (idle input)."""
    m = jnp.abs(p) ** 2 / jnp.maximum(rr, eps) ** 2
    return jnp.where(rr > eps, m, 0.0)
