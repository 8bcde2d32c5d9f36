"""Bisect the planar TX graph on axon — one stage per process.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/tpu_bisect_tx2.py <stage>
Stages: encode qam grid ifft tx_full rx_front rx_full
Each jits a planar-boundary prefix of the chain and fetches the output.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main(name):
    from ofdm_uhd_tpu.core.spec import config
    from ofdm_uhd_tpu.core import boundary as BD
    from ofdm_uhd_tpu.core.platform import fetch
    from ofdm_uhd_tpu.phy import qam as PQ, frame as PF
    from ofdm_uhd_tpu.pipeline import tx as TXP
    from ofdm_uhd_tpu.pipeline import rx as RXP

    t0 = time.time()
    np.asarray(jax.jit(lambda v: v + 1)(jnp.arange(64.0)))  # warmup
    warm = time.time() - t0

    spec = config("c1")
    rng = np.random.default_rng(0)
    p = rng.integers(0, 2, (32, spec.payload_bits_per_frame)).astype(np.uint8)

    def run(fn, *args):
        out = jax.jit(BD.planarize(fn))(*BD.encode_host(args))
        return fetch(out)

    def encode():
        return run(lambda b: TXP._encode(spec, b), p)

    def qam():
        return run(lambda b: PQ.qam_map(TXP._encode(spec, b),
                                        spec.modulation), p)

    def grid():
        def f(b):
            syms = PQ.qam_map(TXP._encode(spec, b), spec.modulation)
            data = syms.reshape(-1, spec.n_data_syms, spec.n_data_sc)
            return PF.build_grid(spec, data)
        return run(f, p)

    def ifft():
        def f(b):
            syms = PQ.qam_map(TXP._encode(spec, b), spec.modulation)
            data = syms.reshape(-1, spec.n_data_syms, spec.n_data_sc)
            return jnp.fft.ifft(PF.build_grid(spec, data), norm="ortho")
        return run(f, p)

    def tx_full():
        return run(lambda b: TXP._tx_step(spec, b), p)

    def rx_front():
        from ofdm_uhd_tpu.golden import GoldenModem
        gm = GoldenModem(spec)
        fr = gm.tx(p).astype(np.complex64)
        return run(lambda x: RXP._frontend(spec, x, 0), fr)

    def rx_full():
        from ofdm_uhd_tpu.golden import GoldenModem
        gm = GoldenModem(spec)
        fr = gm.tx(p).astype(np.complex64)
        return run(lambda x: RXP._rx_aligned(spec, 0, x), fr)

    stages = dict(encode=encode, qam=qam, grid=grid, ifft=ifft,
                  tx_full=tx_full, rx_front=rx_front, rx_full=rx_full)
    t1 = time.time()
    try:
        stages[name]()
        print(f"RESULT {name} OK (warm {warm:.0f}s, run {time.time()-t1:.1f}s)",
              file=sys.stderr, flush=True)
    except Exception as e:
        print(f"RESULT {name} FAIL {type(e).__name__} {str(e)[:110]} "
              f"(warm {warm:.0f}s, run {time.time()-t1:.1f}s)",
              file=sys.stderr, flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1])
