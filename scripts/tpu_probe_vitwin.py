"""One-shot: windowed Viterbi on the axon TPU vs host golden bits."""
import sys, time
import numpy as np, jax, jax.numpy as jnp

def main():
    t0 = time.time()
    np.asarray(jax.jit(lambda v: v + 1)(jnp.arange(64.0)))
    print(f"warm {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    from ofdm_uhd_tpu.phy.bits import viterbi_decode_windowed, viterbi_decode
    from ofdm_uhd_tpu.golden.bits import conv_encode as g_encode
    r = np.random.default_rng(0)
    bits = r.integers(0, 2, (8, 6912)).astype(np.uint8)
    coded = np.stack([g_encode(b) for b in bits]).astype(np.float64)
    tx = 1.0 - 2.0 * coded
    sigma = 10 ** (-6.0 / 20.0)
    llr = ((2.0 / sigma**2) * (tx + sigma * r.standard_normal(tx.shape))
           ).astype(np.float32)
    for name, fn in (("windowed", viterbi_decode_windowed),
                     ("scan", viterbi_decode)):
        t1 = time.time()
        got = np.asarray(jax.jit(fn)(llr))
        ok = np.array_equal(got, bits)
        print(f"RESULT {name} exact={ok} ({time.time()-t1:.1f}s)",
              file=sys.stderr, flush=True)
        if name == "windowed":
            # steady-state timing
            f = jax.jit(fn); f(llr)
            t2 = time.time()
            for _ in range(10): o = f(llr)
            jax.block_until_ready(o)
            print(f"  windowed: {(time.time()-t2)/10*1e3:.2f} ms/iter",
                  file=sys.stderr, flush=True)

if __name__ == "__main__":
    main()
