"""Platform selection that survives this environment's PJRT plugin.

The axon TPU plugin's sitecustomize overwrites JAX_PLATFORMS during
`import jax`, so requesting CPU via the env var silently lands on the TPU
(and concurrent TPU use can wedge the tunnel). honor_env() re-applies the
caller's intent through the config API — call it after importing jax,
before any device use.
"""

from __future__ import annotations

import os


def honor_env(default: str | None = None) -> None:
    want = os.environ.get("OFDM_TPU_PLATFORM") or default
    if want is None:
        return
    import jax

    jax.config.update("jax_platforms", want)


def force_cpu() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
