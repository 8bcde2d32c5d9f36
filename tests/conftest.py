"""Test harness config: force JAX onto CPU with 8 virtual devices.

Real-TPU runs happen via bench.py / the driver; CI tests exercise identical
code paths (including shard_map/ppermute/psum semantics) on a virtual mesh
(SURVEY.md §4 "Distributed without a pod").

Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
