"""Stage 1 (CPU process): compute f32 reference decodes for B in sizes.
Stage 2 (axon process): same inputs on TPU, report mismatches per B."""
import sys, time
import numpy as np

SIZES = (8, 16, 32, 64, 130)

def make_inputs():
    from ofdm_uhd_tpu.golden.bits import conv_encode as g_encode
    r = np.random.default_rng(0)
    n = 6912
    bits = r.integers(0, 2, (max(SIZES), n)).astype(np.uint8)
    coded = np.stack([g_encode(b) for b in bits]).astype(np.float64)
    tx = 1.0 - 2.0 * coded
    sigma = 10 ** (-6.0 / 20.0)
    return ((2.0 / sigma**2) * (tx + sigma * r.standard_normal(tx.shape))
            ).astype(np.float32)

def main():
    mode = sys.argv[1]
    import jax
    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ofdm_uhd_tpu.phy.bits import viterbi_decode
    llr = make_inputs()
    if mode == "cpu":
        out = {}
        for b in SIZES:
            out[str(b)] = np.asarray(jax.jit(viterbi_decode)(llr[:b]))
        np.savez("/tmp/vit_cpu_ref.npz", **out)
        print("cpu refs saved", file=sys.stderr)
        return
    t0 = time.time()
    np.asarray(jax.jit(lambda v: v + 1)(jnp.arange(64.0)))
    print(f"warm {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    ref = np.load("/tmp/vit_cpu_ref.npz")
    for b in SIZES:
        got = np.asarray(jax.jit(viterbi_decode)(llr[:b]))
        n_m = int((got != ref[str(b)]).sum())
        print(f"RESULT B={b}: {n_m} mismatches vs cpu-f32 "
              f"({got.size} bits)", file=sys.stderr, flush=True)

if __name__ == "__main__":
    main()
