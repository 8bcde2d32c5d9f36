"""Executable-boundary planarization for PJRT runtimes with broken complex
boundary support.

The local 'axon' TPU runtime returns UNIMPLEMENTED for every way a
complex64 array can cross the PJRT boundary (scripts/tpu_probe_one.py,
docs/ARCHITECTURE.md quirk log):
  - device->host fetch of a complex array (any size);
  - explicit device_put of complex host data;
  - a device-resident complex array (output of one executable) fed as the
    input of another executable;
  - small complex host arrays as jit args (the inline-literal path).
Complex COMPUTE inside a single executable is fine, as are float/int/bool
boundary crossings of any tested size (>=1.5 MB).

So: complex values exist only INSIDE executables. At every jit boundary a
complex leaf is carried as a `Planar` — its real/imag planes stacked into
one (2, ...) float array. `planarize(fn)` decodes Planar args to complex
right inside the traced function (a free, fused reshape) and re-encodes
complex outputs, so the wrapped executable's signature is complex-free
while the math is unchanged bit-for-bit.

Enabled automatically when the default backend is 'axon'
(`needs_planar()`), or forced with OFDM_FORCE_PLANAR=1 (used by CI to
exercise the planar path on CPU).
"""

from __future__ import annotations

import functools
import os
from typing import Any, NamedTuple

import numpy as np


class Planar(NamedTuple):
    """A complex array encoded as stacked [2, ...] real/imag float planes.

    NamedTuple => automatically a pytree node, so Planar-carrying trees
    pass transparently through jit/shard_map/scan machinery.
    """
    pair: Any


def _is_planar(x) -> bool:
    return isinstance(x, Planar)


def _is_complex(x) -> bool:
    dt = getattr(x, "dtype", None)
    return dt is not None and np.issubdtype(np.dtype(dt), np.complexfloating)


def encode_host(tree):
    """Host-side: numpy complex leaves -> Planar(np stacked planes)."""
    import jax

    def f(x):
        if _is_planar(x):
            return x
        if _is_complex(x):
            a = np.asarray(x)
            return Planar(np.ascontiguousarray(
                np.stack([a.real, a.imag])))
        return x

    return jax.tree_util.tree_map(f, tree, is_leaf=_is_planar)


def encode_traced(tree):
    """Trace-side: complex leaves -> Planar(jnp.stack([re, im]))."""
    import jax
    import jax.numpy as jnp

    def f(x):
        if _is_planar(x):
            return x
        if _is_complex(x):
            return Planar(jnp.stack([jnp.real(x), jnp.imag(x)]))
        return x

    return jax.tree_util.tree_map(f, tree, is_leaf=_is_planar)


def decode(tree):
    """Planar leaves -> complex (works traced and on host arrays)."""
    import jax
    import jax.numpy as jnp

    def f(x):
        if _is_planar(x):
            p = x.pair
            if isinstance(p, np.ndarray):
                out = p[0] + 1j * p[1]
                return out.astype(np.complex64 if p.dtype == np.float32
                                  else np.complex128)
            return jax.lax.complex(p[0], p[1])
        return x

    return jax.tree_util.tree_map(f, tree, is_leaf=_is_planar)


def planarize(fn):
    """Wrap fn so its jit signature is complex-free (Planar in/out)."""

    @functools.wraps(fn)
    def inner(*args, **kwargs):
        args = decode(args)
        kwargs = decode(kwargs)
        return encode_traced(fn(*args, **kwargs))

    return inner


def needs_planar() -> bool:
    force = os.environ.get("OFDM_FORCE_PLANAR")
    if force is not None:
        return force == "1"
    # the axon plugin registers its PJRT client under platform name 'tpu',
    # so detect it by its environment (sitecustomize sets these) + the
    # backend actually being the TPU (tests force CPU via jax.config)
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def device_put_planar(tree, device=None):
    """device_put that keeps complex leaves boundary-safe.

    On planarized runtimes complex leaves go up as Planar f32 pairs (the
    only legal form); elsewhere this is plain jax.device_put. Use for hot
    loops so per-call host->device re-encoding is avoided."""
    import jax

    if needs_planar():
        tree = encode_host(tree)
    return jax.device_put(tree, device)


def jit_planar(fn, **jit_kwargs):
    """jax.jit that planarizes the executable boundary when required.

    On normal backends this IS jax.jit(fn). On axon (or with
    OFDM_FORCE_PLANAR=1) the jitted signature carries complex leaves as
    Planar planes; host args are encoded per call (already-Planar args
    pass through, so hot loops can pre-encode once with encode_host).
    """
    if not needs_planar():
        return __import__("jax").jit(fn, **jit_kwargs)
    import jax

    inner = jax.jit(planarize(fn), **jit_kwargs)

    @functools.wraps(fn)
    def call(*args, **kwargs):
        static = set(jit_kwargs.get("static_argnames", ()))
        dyn = {k: v for k, v in kwargs.items() if k not in static}
        stat = {k: v for k, v in kwargs.items() if k in static}
        return inner(*encode_host(args), **encode_host(dyn), **stat)

    return call
