"""Bisect detect_frames sub-ops on the axon TPU at capture size."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def stage(name, fn, *args):
    t0 = time.time()
    try:
        out = jax.block_until_ready(jax.jit(fn)(*args))
        # force full materialization
        jax.tree_util.tree_map(lambda v: np.asarray(v), out)
        log(f"[{time.time()-t0:7.1f}s] {name}: OK")
        return out
    except Exception as e:
        log(f"[{time.time()-t0:7.1f}s] {name}: FAIL {type(e).__name__} {str(e)[:120]}")
        return None


def main():
    from ofdm_uhd_tpu.core.spec import config
    from ofdm_uhd_tpu.kernels.sync import sc_correlate, sc_metric

    spec = config("c3")
    n = 34756
    l = spec.n_sc // 2
    rng = np.random.default_rng(0)
    cap = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    capj = jax.device_put(cap)

    stage("prod+energy", lambda v: (jnp.conj(v[:-l]) * v[l:], jnp.abs(v) ** 2), capj)
    pr = stage("sc_correlate(conv)", lambda v: sc_correlate(v, l), capj)
    if pr is None:
        return
    stage("sc_metric", lambda v: sc_metric(*sc_correlate(v, l)), capj)

    nd = n - 2 * l + 1
    m = np.abs(rng.standard_normal(nd)).astype(np.float32)
    mj = jax.device_put(m)
    stage("argmax34k", lambda v: jnp.argmax(v), mj)
    stage("first_above", lambda v: jnp.argmax((jnp.arange(v.shape[0]) >= 5) & (v >= 0.5)), mj)

    span = spec.sym_len

    def slot_scan(mvec):
        idx = jnp.arange(mvec.shape[0], dtype=jnp.int32)
        m_pad = jnp.concatenate([mvec, jnp.zeros(span, mvec.dtype)])

        def slot(pos, _):
            mask = (idx >= pos) & (mvec >= 0.5)
            found = jnp.any(mask)
            first = jnp.argmax(mask).astype(jnp.int32)
            w = jax.lax.dynamic_slice(m_pad, (first,), (span,))
            peak_off = jnp.argmax(w).astype(jnp.int32)
            above = w >= 0.9 * w[peak_off]
            lo = jnp.argmax(above).astype(jnp.int32)
            hi = span - 1 - jnp.argmax(above[::-1]).astype(jnp.int32)
            d = jnp.maximum(first + (lo + hi) // 2 - 8, 0)
            valid = found
            return jnp.where(valid, d + 4032, jnp.int32(mvec.shape[0])), (d, valid)

        return jax.lax.scan(slot, jnp.int32(0), None, length=10)

    stage("slot_scan", slot_scan, mj)

    from ofdm_uhd_tpu.phy import sync as PS
    stage("detect_frames", lambda v: PS.detect_frames(spec, v, 10), capj)
    ds = jnp.asarray(np.arange(10, dtype=np.int32) * 1000)
    stage("extract", lambda v, d: PS.extract_frames(spec, v, d), capj, ds)


if __name__ == "__main__":
    main()
