"""Staged TPU smoke probe: times compile+run of each chain stage.

Run ALONE (single TPU process). Logs to stderr with flush so partial
progress survives timeouts.
"""

import sys
import time

import numpy as np
import jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def stage(name, fn):
    t0 = time.time()
    try:
        out = jax.block_until_ready(fn())
        log(f"[{time.time()-t0:7.1f}s] {name}: OK")
        return out
    except Exception as e:
        log(f"[{time.time()-t0:7.1f}s] {name}: FAIL {type(e).__name__} {str(e)[:150]}")
        return None


def main():
    from ofdm_uhd_tpu.core.spec import config
    from ofdm_uhd_tpu.pipeline import RxPipeline, TxPipeline
    from ofdm_uhd_tpu.phy import sync as PS
    import bench as B

    log("devices:", jax.devices())

    spec1 = config("c1")
    rng = np.random.default_rng(0)
    p1 = rng.integers(0, 2, (4, spec1.payload_bits_per_frame)).astype(np.uint8)
    tx1 = TxPipeline(spec1)
    fr1 = stage("c1 tx[4]", lambda: tx1(p1))
    rx1 = RxPipeline(spec1)
    if fr1 is not None:
        out = stage("c1 rx_aligned[4]", lambda: rx1.rx_aligned(fr1))
        if out is not None:
            log("   crc:", np.asarray(out["crc_ok"]).tolist())

    spec3 = config("c3")
    cap, payloads, _ = B._build_capture(spec3, 8, 300)
    capj = jax.device_put(cap)
    f_det = jax.jit(lambda v: PS.detect_frames(spec3, v, 10))
    det = stage("c3 detect[34756]", lambda: f_det(capj))
    if det is not None:
        log("   valid:", np.asarray(det[2]).tolist())

    rx3 = RxPipeline(spec3)
    out = stage("c3 rx_capture[34756]", lambda: rx3.rx_capture(capj, max_frames=10))
    if out is not None:
        ok = np.asarray(out["crc_ok"])
        log("   crc:", ok.tolist())
        log("   bits ok:", np.array_equal(np.asarray(out["payload"])[:8], payloads))
        t0 = time.time()
        for _ in range(10):
            out = rx3.rx_capture(capj, max_frames=10)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 10
        log(f"   steady: {len(cap)/dt/1e6:.2f} Msamples/s")


if __name__ == "__main__":
    main()
