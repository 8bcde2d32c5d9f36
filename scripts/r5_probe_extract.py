"""r5 probe 1: decompose the batch-32 extract+CFO stage and A/B the
Pallas DMA extraction (pallas_extract) against the gather form.

Increments (all vmapped x BATCH, net floor-free ms per dispatch):
  det        detect_frames only                      (baseline)
  ext-g      det + gather extract_frames
  ext-p      det + Pallas extract_frames
  ramp1-g/p  ... + first full-frame CFO ramp
  icfo-g/p   ... + integer_cfo search
  full-g/p   ... + second ramp (the chain's extract+CFO stage complete)
  fe-g/p     ... + frontend (FFT->LLR) — does the gather pathology reach
             the front end too?

Usage: nohup python scripts/r5_probe_extract.py > bench/results/r5_probe_extract.log 2>&1 &
"""

import functools
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
    from ofdm_uhd_tpu.core.spec import config
    from ofdm_uhd_tpu.core.boundary import device_put_planar, planarize
    from ofdm_uhd_tpu.phy import sync as PS
    from ofdm_uhd_tpu.pipeline import rx as RXP
    from ofdm_uhd_tpu.kernels.pallas_extract import extract_frames_pallas
    from bench_lib import build_capture, net_time

    spec = config("c3")
    frames_n = 128
    batch = 32
    mf = frames_n + 2
    cap, _ = build_capture(spec, frames_n, gap=300)
    n = len(cap)
    log(f"# device={jax.devices()[0].device_kind} n={n} batch={batch} "
        f"mf={mf} frame_len={spec.frame_len}")

    def ext_g(c, ds):
        return PS.extract_frames(spec, c, ds)

    def ext_p(c, ds):
        return extract_frames_pallas(c, ds, spec.frame_len)

    def stage(ext, upto):
        def f(c):
            ds, eps_f, valid = PS.detect_frames(spec, c, mf)
            if upto == "ext":
                return ext(c, ds)
            frames = ext(c, ds)
            frames = PS.cfo_correct(frames, eps_f, spec.n_sc)
            if upto == "ramp1":
                return frames
            k = PS.integer_cfo(spec, frames)
            if upto == "icfo":
                return k
            frames = PS.cfo_correct(frames, k.astype(jnp.float32), spec.n_sc)
            if upto == "full":
                return frames
            return RXP._frontend(spec, frames, shift=min(4, spec.cp // 4))
        return f

    def det_only(c):
        return PS.detect_frames(spec, c, mf)

    # on-chip jitted equality smoke FIRST (tiny): Mosaic must compile the
    # extraction kernel and emit gather-identical bits before any timing
    from ofdm_uhd_tpu.core.boundary import jit_planar
    scap, _ = build_capture(spec, 8, gap=300)
    smf = 10

    def _sm(ext):
        def f(c):
            ds, eps_f, valid = PS.detect_frames(spec, c, smf)
            return ext(c, ds)
        return jit_planar(jax.vmap(f))
    from ofdm_uhd_tpu.core.platform import fetch
    sc2 = np.stack([scap] * 2)
    a = np.asarray(fetch(_sm(ext_g)(sc2)))
    b = np.asarray(fetch(_sm(ext_p)(sc2)))
    log(f"# smoke: pallas-extract on-chip bitexact={np.array_equal(a, b)} "
        f"maxdiff={np.max(np.abs(a - b)):.3e}")
    if not np.array_equal(a, b):
        log("# smoke FAILED — aborting probe")
        return

    caps = np.stack([cap] * batch)
    stacked = jax.tree.map(
        lambda *ls: jnp.stack(ls),
        *[device_put_planar(caps * np.float32(1 + 1e-6 * i))
          for i in range(2)])

    rows = [("det", jax.vmap(det_only))]
    for nm, ext in (("g", ext_g), ("p", ext_p)):
        for upto in ("ext", "ramp1", "icfo", "full", "fe"):
            rows.append((f"{upto}-{nm}", jax.vmap(stage(ext, upto))))

    results = {}
    for nm, fn in rows:
        t0 = time.time()
        try:
            net = net_time(planarize(fn), stacked, iters=3, r_lo=4, r_hi=32)
            results[nm] = net * 1e3
            log(f"# {nm:<10} net {net*1e3:8.2f} ms   "
                f"({batch * n / net / 1e6:7.1f} Msps)  [{time.time()-t0:.0f}s]")
        except Exception as e:
            log(f"# {nm:<10} FAILED {type(e).__name__}: {str(e)[:200]}")
    log(json.dumps({"probe": "r5_extract", "batch": batch, "n": n,
                    "net_ms": {k: round(v, 3) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
