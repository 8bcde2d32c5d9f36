"""Which construct miscompiles the standalone Viterbi on axon?
Variants differ only in input handling / unroll. Mismatch vs golden."""
import sys, time
import numpy as np, jax, jax.numpy as jnp

def main():
    t0 = time.time()
    np.asarray(jax.jit(lambda v: v + 1)(jnp.arange(64.0)))
    print(f"warm {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    import ofdm_uhd_tpu.phy.bits as PB
    from ofdm_uhd_tpu.golden.bits import conv_encode as g_encode, viterbi_decode as g_vit
    import ofdm_uhd_tpu.phy.tables as T
    r = np.random.default_rng(0)
    n = 6912
    bits = r.integers(0, 2, (8, n)).astype(np.uint8)
    coded = np.stack([g_encode(b) for b in bits]).astype(np.float64)
    tx = 1.0 - 2.0 * coded
    sigma = 10 ** (-6.0 / 20.0)
    llr64 = (2.0 / sigma**2) * (tx + sigma * r.standard_normal(tx.shape))
    llr = llr64.astype(np.float32)
    gold = np.stack([g_vit(l) for l in llr.astype(np.float64)])

    la_h = np.ascontiguousarray(llr[:, 0::2])   # host-side split
    lb_h = np.ascontiguousarray(llr[:, 1::2])

    def decode_split(la, lb):
        """same ACS/traceback as PB.viterbi_decode but takes pre-split LLRs"""
        inter = jnp.stack([la, lb], axis=-1).reshape(la.shape[0], -1)
        return PB.viterbi_decode(inter)

    stages = [
        ("baseline", lambda: jax.jit(PB.viterbi_decode)(llr)),
        ("presplit_interleave_inside", lambda: jax.jit(decode_split)(la_h, lb_h)),
        ("no_unroll", lambda: jax.jit(
            lambda v: PB.viterbi_decode(v, unroll=1))(llr)),
        ("times_one", lambda: jax.jit(
            lambda v: PB.viterbi_decode(v * 1.0))(llr)),
    ]
    for name, fn in stages:
        got = np.asarray(fn())
        print(f"RESULT {name}: {int((got != gold).sum())} mismatches",
              file=sys.stderr, flush=True)

if __name__ == "__main__":
    main()
