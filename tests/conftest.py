"""Test harness config: force JAX onto CPU with 8 virtual devices.

Real-TPU runs happen via bench.py / the driver; CI tests exercise identical
code paths (including shard_map/ppermute/psum semantics) on a virtual mesh
(SURVEY.md §4 "Distributed without a pod").

NOTE this environment ships an 'axon' TPU PJRT plugin that overrides the
JAX_PLATFORMS env var during `import jax`, so we must also force the
platform through the config API. Only one process may own the TPU tunnel at
a time — tests must never touch it.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
