"""Shared bench helpers: synthetic capture construction.

Used by bench.py (headline), bench/stages.py (per-stage timing) and
bench/sweeps.py so every harness measures the same waveform.
"""

from __future__ import annotations

import numpy as np


_TX_CACHE: dict = {}


def _tx_frames(spec, payloads: np.ndarray) -> np.ndarray:
    """Modulate frames with the JAX TxPipeline pinned to the host CPU.

    ~100x faster than the float64 golden modulator for large captures and
    bit-equivalent at capture SNRs (TX chains are equality-tested in
    tests/unit); keeps the TPU free for the RX under test."""
    import jax
    from ofdm_uhd_tpu.core import platform
    from ofdm_uhd_tpu.pipeline import TxPipeline

    # pin the TX's kernel routing to 'xla' too: under jax.default_device
    # (cpu) the global default_backend still reports the TPU, so 'auto'
    # would pick compiled-Pallas kernels for a CPU device ("Only
    # interpret mode is supported on CPU backend", r5 session 7)
    spec = spec.with_(kernel_backend="xla")
    cpu = jax.devices("cpu")[0]
    key = spec           # frozen dataclass: hashable, survives the with_
    with jax.default_device(cpu):
        tx = _TX_CACHE.setdefault(key, TxPipeline(spec))
        return np.asarray(platform.fetch(tx(payloads)))


def build_capture(spec, n_frames: int, gap: int, seed: int = 0,
                  snr_db: float = 28.0, cfo: float = 0.8,
                  phase_noise_std: float = 2e-4, timing_offset: int = 100,
                  tx: str = "jax"):
    """Multi-frame capture with channel impairments.

    Returns (capture complex64 [n], payloads uint8 [n_frames, bits]).
    tx='jax' modulates with the CPU-pinned TxPipeline (fast); tx='golden'
    uses the float64 golden modulator (the accuracy oracle).
    """
    from ofdm_uhd_tpu.core.spec import ChannelSpec
    from ofdm_uhd_tpu.channel import make_capture

    rng = np.random.default_rng(seed)
    payloads = rng.integers(
        0, 2, (n_frames, spec.payload_bits_per_frame)).astype(np.uint8)
    if tx == "jax":
        frames = _tx_frames(spec, payloads)
    else:
        from ofdm_uhd_tpu.golden import GoldenModem
        gm = GoldenModem(spec)
        frames = np.stack([gm.modulate_frame(p) for p in payloads])
    ch = ChannelSpec(snr_db=snr_db, cfo=cfo, phase_noise_std=phase_noise_std,
                     timing_offset=timing_offset)
    cap = make_capture(frames, ch, spec.n_sc, gap=gap, seed=seed)
    return cap.astype(np.complex64), payloads


def net_time(fn, stacked, iters: int = 4, r_lo: int = 64, r_hi: int = 2048,
             timed_loop=None):
    """Floor-free net seconds per application of `fn` (kernels_ab protocol).

    Runs `reps` applications of fn inside ONE dispatch via lax.fori_loop
    with a TRACED trip count over the leading axis of `stacked` (cycled
    perturbed inputs defeat caching); times r_lo and r_hi reps of the SAME
    executable and takes the slope — the per-dispatch floor of this
    tunnel (50-270 ms on bad days) cancels exactly. Returns net seconds
    per rep; raises on non-positive slope (floor noise).

    fn may return any pytree; each application is kept live by reducing
    its smallest leaf into the carried scalar.
    """
    import jax
    import jax.numpy as jnp
    from ofdm_uhd_tpu.core.boundary import jit_planar
    from ofdm_uhd_tpu.metrics import timed_loop as _tl
    tl = timed_loop or _tl
    k = jax.tree_util.tree_leaves(stacked)[0].shape[0]

    def loop(st, reps):
        def body(i, c):
            xi = jax.tree.map(
                lambda s: jax.lax.dynamic_index_in_dim(
                    s, i % k, axis=0, keepdims=False), st)
            out = fn(xi)
            leaves = [x for x in jax.tree_util.tree_leaves(out)
                      if hasattr(x, "size") and x.size]
            # reduce a few elements of EVERY leaf: keeping only the
            # smallest alive lets XLA dead-code-eliminate the rest of
            # the graph (found r5: a scalar diagnostic leaf made the
            # full-chain "net" measure just the detection subgraph)
            acc = c
            for r in leaves:
                r = jnp.real(r) if jnp.iscomplexobj(r) else r
                acc = acc + jnp.sum(r.ravel()[:16].astype(jnp.float32))
            return acc
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    jl = jit_planar(loop)
    lo = jnp.int32(r_lo)
    hi = jnp.int32(r_hi)
    tl(jl, [(stacked, lo), (stacked, hi)], 2)          # warm both
    dt_lo, _ = tl(jl, [(stacked, lo)], iters)
    dt_hi, _ = tl(jl, [(stacked, hi)], iters)
    slope = dt_hi - dt_lo
    if slope <= 0:
        raise RuntimeError(f"net slope buried in floor noise "
                           f"(lo {dt_lo*1e3:.1f} ms >= hi {dt_hi*1e3:.1f})")
    return slope / (r_hi - r_lo)
