"""Windowed/scan Viterbi on TPU vs golden float64 decoder: mismatch COUNTS.
A backend miscompile looks like ~50% mismatch; channel noise < 0.1%."""
import sys, time
import numpy as np, jax, jax.numpy as jnp

def main():
    t0 = time.time()
    np.asarray(jax.jit(lambda v: v + 1)(jnp.arange(64.0)))
    print(f"warm {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    from ofdm_uhd_tpu.phy.bits import viterbi_decode_windowed, viterbi_decode
    from ofdm_uhd_tpu.golden.bits import conv_encode as g_encode, viterbi_decode as g_vit
    r = np.random.default_rng(0)
    bits = r.integers(0, 2, (8, 6912)).astype(np.uint8)
    coded = np.stack([g_encode(b) for b in bits]).astype(np.float64)
    tx = 1.0 - 2.0 * coded
    sigma = 10 ** (-6.0 / 20.0)
    llr64 = (2.0 / sigma**2) * (tx + sigma * r.standard_normal(tx.shape))
    llr = llr64.astype(np.float32)
    gold = np.stack([g_vit(l) for l in llr.astype(np.float64)])
    nerr_ch = int((gold != bits).sum())
    print(f"golden vs true bits: {nerr_ch} bit errors (channel)",
          file=sys.stderr, flush=True)
    fns = {"scan": viterbi_decode, "windowed": viterbi_decode_windowed}
    outs = {}
    for name, fn in fns.items():
        f = jax.jit(fn)
        got = np.asarray(f(llr))
        outs[name] = got
        n_g = int((got != gold).sum())
        print(f"RESULT {name}: {n_g} mismatches vs golden "
              f"({got.size} bits)", file=sys.stderr, flush=True)
        t2 = time.time()
        for _ in range(10): o = f(llr)
        jax.block_until_ready(o)
        print(f"  {name}: {(time.time()-t2)/10*1e3:.2f} ms/iter",
              file=sys.stderr, flush=True)
    n_sw = int((outs["scan"] != outs["windowed"]).sum())
    print(f"scan vs windowed on-chip: {n_sw} mismatches",
          file=sys.stderr, flush=True)

if __name__ == "__main__":
    main()
