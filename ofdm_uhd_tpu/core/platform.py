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


def force_cpu(n_devices: int | None = None) -> None:
    """Pin this process to the host CPU backend (the axon sitecustomize
    rewrites JAX_PLATFORMS at `import jax`, so the config API is the only
    reliable lever). n_devices: also request a virtual device count —
    only honored if set before first backend use."""
    import os

    if n_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")


def fetch(tree):
    """Pytree device->host transfer that survives runtimes lacking complex
    transfers.

    The axon PJRT runtime returns UNIMPLEMENTED for any complex64
    device->host copy (scripts/tpu_probe_transfer.py; quirk log in
    docs/ARCHITECTURE.md) while bool/int/float copies and complex *compute*
    work. Complex leaves are split into a stacked (2, ...) float array on
    device — a trivial fused kernel — fetched as floats, and reassembled
    on the host. All other leaves fetch directly.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    from .boundary import Planar, _is_planar

    def leaf(x):
        if _is_planar(x):
            h = np.asarray(x.pair)
            return (h[0] + 1j * h[1]).astype(
                np.complex64 if h.dtype == np.float32 else np.complex128)
        dt = getattr(x, "dtype", None)
        if (isinstance(x, jax.Array) and dt is not None
                and jnp.issubdtype(dt, jnp.complexfloating)):
            pair = jax.jit(lambda v: jnp.stack([jnp.real(v), jnp.imag(v)]))(x)
            h = np.asarray(pair)
            return (h[0] + 1j * h[1]).astype(dt)
        return np.asarray(x)

    return jax.tree_util.tree_map(leaf, tree, is_leaf=_is_planar)
