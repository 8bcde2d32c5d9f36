"""AGC / power normalization (SURVEY.md §2.1 #20).

The reference-class RX front-end normalizes input level before sync (C++
running-power AGC). In this chain the one-tap EQ absorbs any static gain,
so AGC mainly conditions the S&C threshold and the int16 capture path.
Stateless block form here; the streaming receiver applies it per chunk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def agc_normalize(x: jax.Array, target: float = 1.0,
                  eps: float = 1e-20) -> tuple[jax.Array, jax.Array]:
    """Scale [..., n] blocks to mean power `target` (per leading index).

    Returns (scaled, gain). Idle blocks (power ~ 0) pass through unscaled.
    """
    p = jnp.mean(jnp.abs(x) ** 2, axis=-1, keepdims=True)
    gain = jnp.where(p > eps, jnp.sqrt(target / jnp.maximum(p, eps)), 1.0)
    return x * gain.astype(x.dtype), gain[..., 0]


def agc_normalize_np(x: np.ndarray, target: float = 1.0) -> np.ndarray:
    """Golden float64 twin."""
    p = np.mean(np.abs(x) ** 2)
    if p <= 1e-20:
        return x.copy()
    return x * np.sqrt(target / p)
