"""r5 probe 3: fused S&C front end (pallas_scfront) A/B + MXU sc-corr
block sweep + chain-level detection impact at C3 geometry."""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def log(*a): print(*a, flush=True)

def main():
    import jax, jax.numpy as jnp, functools
    from ofdm_uhd_tpu.core.boundary import planarize, device_put_planar
    from ofdm_uhd_tpu.core.spec import config
    from ofdm_uhd_tpu.kernels.sync import sc_correlate, sc_metric
    from ofdm_uhd_tpu.kernels.pallas_scfront import sc_frontend_pallas
    from ofdm_uhd_tpu.kernels.pallas_sync import sc_correlate_mxu
    from ofdm_uhd_tpu.phy import sync as PS
    from bench_lib import build_capture, net_time
    log(f"# dev {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    n = 1 << 20
    x = (rng.normal(size=n) + 1j*rng.normal(size=n)).astype(np.complex64)
    def stk(a_):
        return jax.tree.map(lambda *ls: jnp.stack(ls),
                            *[device_put_planar(a_*np.float32(1+1e-6*i)) for i in range(2)])
    st = stk(x)
    results = {}
    rows = [
        ("xla-compose", lambda v: sc_metric(*sc_correlate(v, 128, "xla")), st, 12*n),
        ("scfront-128", lambda v: sc_frontend_pallas(v, 128)[1], st, 20*n),
        ("scfront-tr512", lambda v: sc_frontend_pallas(v, 128, tr=512)[1], st, 20*n),
        ("mxu-blk256", lambda v: sc_metric(*sc_correlate_mxu(v, 128, tr=1024)), st, 12*n),
    ]
    for nm, fn, s, bio in rows:
        try:
            t0 = time.time()
            net = net_time(planarize(fn), s, iters=4, r_lo=64, r_hi=1024)
            results[nm] = net*1e3
            log(f"# {nm:<14} net {net*1e3:8.4f} ms  {bio/net/1e9:7.1f} GB/s [{time.time()-t0:.0f}s]")
        except Exception as e:
            log(f"# {nm} FAIL {type(e).__name__} {str(e)[:200]}")
    # chain-level: detection (corr+detect) with fused front end vs xla, batch 32
    spec = config("c3")
    cap, _ = build_capture(spec, 128, gap=300)
    mf = 130
    caps = np.stack([cap]*32)
    cst = stk(caps)
    def det(front):
        def f(c):
            return PS.detect_frames(spec, c, mf, front=front)
        return jax.vmap(f)
    for nm, front in (("det-xla", "xla"), ("det-fused", "fused")):
        try:
            net = net_time(planarize(det(front)), cst, iters=3, r_lo=4, r_hi=32)
            results[nm] = net*1e3
            log(f"# {nm:<14} net {net*1e3:8.3f} ms")
        except Exception as e:
            log(f"# {nm} FAIL {type(e).__name__} {str(e)[:200]}")
    log(json.dumps({"probe": "r5_scfront", "net_ms": {k: round(v,4) for k,v in results.items()}}))

if __name__ == "__main__":
    main()
