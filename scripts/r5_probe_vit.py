"""r5 probe 2: decode-stage attacks at the headline batch (VERDICT r4
item 4 — third decode swing).

Variants, all bit-exactness-gated against viterbi_decode on CPU-golden
encodable inputs before timing:
  v0   current scan decoder (baseline; in-scan packed decisions)
  v1   state-major [64, B] ACS layout: the per-step predecessor shuffle
       pm[..., p::2] is a LANE-strided extract in the [B, 64] layout
       (relayout cost); transposed it becomes a SUBLANE stride — register
       moves. Traceback unchanged ([B]-lane vectors).
  v2   radix-4 two-step ACS in the current layout: fuse two trellis
       steps per scan body — halves BOTH scan lengths (forward ACS and
       traceback) at the same total VPU work.
  v3   v1 + v2 combined.

Usage: nohup python scripts/r5_probe_vit.py > bench/results/r5_probe_vit.log 2>&1 &
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from ofdm_uhd_tpu.phy import bits as PB
    from ofdm_uhd_tpu.phy.bits import (viterbi_decode, conv_encode)
    from ofdm_uhd_tpu.research import viterbi_variants as R5
    from bench_lib import net_time
    from ofdm_uhd_tpu.core.boundary import planarize

    n = 6912 // 2          # uncoded bits per frame (C3: coded 6912)
    rng = np.random.default_rng(0)

    # correctness gate: decodable noisy LLRs -> all variants bit-exact
    bits = rng.integers(0, 2, size=(8, n)).astype(np.uint8)
    coded = np.asarray(conv_encode(jnp.asarray(bits)))
    llr_clean = (1.0 - 2.0 * coded).astype(np.float32)
    llr = llr_clean + 0.45 * rng.normal(size=llr_clean.shape).astype(
        np.float32)
    ref = np.asarray(viterbi_decode(jnp.asarray(llr)))
    variants = {
        "v0": viterbi_decode,
        "v1": R5.viterbi_decode_smaj,
        "v2": R5.viterbi_decode_radix4,
        "v3": R5.viterbi_decode_smaj_radix4,
    }
    for nm, fn in list(variants.items()):
        if fn is None:
            variants.pop(nm)
            continue
        got = np.asarray(fn(jnp.asarray(llr)))
        same = np.array_equal(got, ref)
        log(f"# gate {nm}: bitexact={same}")
        if not same:
            log(f"#   mism={np.mean(got != ref):.4f} -> dropped")
            variants.pop(nm)

    results = {}
    for batch in (4160, 1040, 130):
        big = rng.normal(size=(batch, 2 * n)).astype(np.float32)
        stacked = jnp.stack([jnp.asarray(big * np.float32(1 + 1e-6 * i))
                             for i in range(2)])
        for nm, fn in variants.items():
            t0 = time.time()
            try:
                r_hi = 32 if batch >= 4000 else 64
                net = net_time(planarize(fn), stacked, iters=3,
                               r_lo=max(2, r_hi // 8), r_hi=r_hi)
                results[f"{nm}-b{batch}"] = net * 1e3
                log(f"# {nm}-b{batch:<5} net {net*1e3:8.2f} ms  "
                    f"[{time.time()-t0:.0f}s]")
            except Exception as e:
                log(f"# {nm}-b{batch} FAILED {type(e).__name__}: "
                    f"{str(e)[:160]}")
    log(json.dumps({"probe": "r5_vit", "n": n,
                    "net_ms": {k: round(v, 3) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
