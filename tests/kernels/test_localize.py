"""Pallas localize kernel == the XLA vmapped localize (interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ofdm_uhd_tpu.core.spec import config
from ofdm_uhd_tpu.kernels.pallas_localize import localize_pallas


def _xla_localize(m, p, cand, span, cp, rel=0.9):
    nd = m.shape[-1]
    m_pad = jnp.concatenate([m, jnp.zeros(span, m.dtype)])

    def one(c):
        w = jax.lax.dynamic_slice(m_pad, (c,), (span,))
        peak_off = jnp.argmax(w).astype(jnp.int32)
        peak_val = jnp.max(w)
        ab = w >= rel * peak_val
        lo = jnp.argmax(ab).astype(jnp.int32)
        hi = span - 1 - jnp.argmax(ab[::-1]).astype(jnp.int32)
        d = jnp.maximum(c + (lo + hi) // 2 - cp // 2, 0)
        pv = jax.lax.dynamic_slice(
            p, (jnp.minimum(c + peak_off, nd - 1),), (1,))[0]
        return d, (jnp.angle(pv) / jnp.pi).astype(jnp.float32)

    return jax.vmap(one)(cand)


@pytest.mark.parametrize("seed", range(6))
def test_localize_matches_xla(seed):
    spec = config("c3")
    rng = np.random.default_rng(seed)
    nd = 40000
    m = (rng.random(nd) ** 4).astype(np.float32)        # spiky metric
    p = (rng.normal(size=nd) + 1j * rng.normal(size=nd)).astype(np.complex64)
    cand = jnp.asarray(np.sort(
        rng.integers(0, nd - 2 * spec.sym_len, 20)).astype(np.int32))
    d_ref, e_ref = _xla_localize(jnp.asarray(m), jnp.asarray(p), cand,
                                 spec.sym_len, spec.cp)
    d_got, e_got = localize_pallas(jnp.asarray(m), jnp.asarray(p), cand,
                                   spec.sym_len, spec.cp)
    np.testing.assert_array_equal(np.asarray(d_got), np.asarray(d_ref))
    np.testing.assert_allclose(np.asarray(e_got), np.asarray(e_ref),
                               atol=1e-6)
