"""Tunnel H2D/D2H bandwidth probe: times jax.device_put /np.asarray for
transfer sizes 1-128 MB. Motivated by the r3 streaming benches, where
per-dispatch overhead scaled SUPERLINEARLY with feed bytes (8 MB -> 0.4 s,
33 MB -> 8.5 s, 66 MB -> 96 s): this measures whether the tunnel's
transfer bandwidth is size-dependent, which decides the chunked-upload
design for StreamRx. Writes bench/results/h2d_probe.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ofdm_uhd_tpu.metrics import JsonlLogger

    dev = jax.devices()[0]
    rows = []
    # warm the tunnel
    np.asarray(jax.device_put(np.ones(8, np.float32)))
    for mb in (1, 4, 8, 16, 32, 64, 128):
        n = mb * 1024 * 1024 // 4
        best_up, best_down = float("inf"), float("inf")
        for it in range(3):
            x = np.random.default_rng(it).random(n, np.float32)
            t0 = time.perf_counter()
            d = jax.device_put(x, dev)
            d.block_until_ready()
            # force real materialization: reduce on device and fetch
            float(jnp.sum(d[:8]))
            up = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = np.asarray(d)
            down = time.perf_counter() - t0
            best_up, best_down = min(best_up, up), min(best_down, down)
        rec = {"mb": mb, "h2d_s": round(best_up, 3),
               "h2d_mbps": round(mb / best_up, 1),
               "d2h_s": round(best_down, 3),
               "d2h_mbps": round(mb / best_down, 1),
               "device": dev.device_kind}
        rows.append(rec)
        print(f"# {mb:4d} MB  up {best_up:7.3f}s ({mb/best_up:7.1f} MB/s)"
              f"  down {best_down:7.3f}s ({mb/best_down:7.1f} MB/s)",
              file=sys.stderr, flush=True)
    lg = JsonlLogger("bench/results/h2d_probe.jsonl")
    for r in rows:
        lg.log(r)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
