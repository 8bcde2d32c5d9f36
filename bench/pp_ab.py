"""2-stage pipeline-parallel RX vs frame-parallel RX — measured verdict
(VERDICT r3 item 8: 'give stage-pipeline a number or demote it').

Runs both on the virtual 8-device CPU mesh (multi-chip TPU hardware is
not reachable here): 2 stages x 1 vs 2 frame-shards on the SAME two
devices, plus the full 8-way frame-parallel row. Absolute numbers are
CPU-host numbers; the RELATIVE ordering is the architecture claim —
the RX chain is embarrassingly frame-parallel (no cross-frame state, no
weights that could exceed one chip's HBM: the largest constant is the
~KB pilot/trellis table set), so PP's ppermute hop and bubble overhead
buys nothing that frame-sharding doesn't already provide. PP stays in
the tree as a demonstration of the LLR-boundary cut (SURVEY.md §2.3
'stretch'), with this row as its documented rejection.

    PYTHONPATH=/root/repo python bench/pp_ab.py [--batch 64] [--iters 3]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--jsonl", default=None)
    args = ap.parse_args()

    from ofdm_uhd_tpu.core.platform import force_cpu
    force_cpu(n_devices=8)
    import jax
    from ofdm_uhd_tpu.core.spec import config, ChannelSpec
    from ofdm_uhd_tpu.channel import apply_channel
    from ofdm_uhd_tpu.golden import GoldenModem
    from ofdm_uhd_tpu.shard.mesh import make_mesh, make_stage_mesh
    from ofdm_uhd_tpu.shard.frame_parallel import rx_frames_sharded
    from ofdm_uhd_tpu.shard.stage_pipeline import rx_aligned_pipelined

    spec = config("c2")
    gm = GoldenModem(spec)
    rng = np.random.default_rng(0)
    payloads = rng.integers(0, 2, (args.batch, spec.payload_bits_per_frame)
                            ).astype(np.uint8)
    frames = np.stack([gm.modulate_frame(p) for p in payloads])
    rx_in = np.stack([apply_channel(frames[i], ChannelSpec(snr_db=25.0),
                                    spec.n_sc, seed=i)
                      for i in range(args.batch)]).astype(np.complex64)

    def timed(name, fn):
        out = fn(rx_in)                      # compile + correctness
        ok = np.asarray(jax.device_get(out["crc_ok"])).all()
        pay = np.array_equal(np.asarray(out["payload"]), payloads)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(rx_in)
            jax.tree_util.tree_leaves(out)[0].block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:<26} {dt*1e3:9.2f} ms  bit_exact={bool(ok and pay)}",
              flush=True)
        return {"mode": name, "ms": round(dt * 1e3, 2),
                "bit_exact": bool(ok and pay)}

    devs = jax.devices()
    rows = [
        timed("pp-2stage (2 devices)",
              rx_aligned_pipelined(spec, make_stage_mesh(2), n_micro=4)),
        timed("frame-parallel (2 devices)",
              rx_frames_sharded(spec, make_mesh(2, 1, devices=devs[:2]))),
        timed("frame-parallel (8 devices)",
              rx_frames_sharded(spec, make_mesh(8, 1))),
    ]
    if args.jsonl:
        from ofdm_uhd_tpu.metrics import JsonlLogger
        lg = JsonlLogger(args.jsonl)
        for r in rows:
            r.update({"batch": args.batch, "config": "c2",
                      "device": "cpu-virtual"})
            lg.log(r)


if __name__ == "__main__":
    main()
