"""BER/EVM vs SNR sweep — the reference-class repo's sweep scripts, done
as a reproducible harness (SURVEY.md §4 'BER-vs-SNR sweep scripts').

    PYTHONPATH=/root/repo python bench/sweeps.py --config c2 \
        --snrs 4,6,8,10,12 --frames 50 [--jsonl out.jsonl]

Reports pre-FEC BER, post-FEC frame error rate, and EVM per SNR point,
plus the analytic uncoded QPSK/QAM reference where defined.
"""

from __future__ import annotations

import argparse
import json
import math
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from ofdm_uhd_tpu.cli import config as C  # noqa: E402


def q(x):
    return 0.5 * math.erfc(x / math.sqrt(2.0))


def uncoded_ber_theory(spec, snr_db: float) -> float:
    """Per-bit error prob for Gray square QAM on occupied-bin SNR."""
    esn0 = 10 ** (snr_db / 10.0) * spec.n_sc / spec.n_occupied
    m = 2 ** spec.bits_per_qam
    if spec.bits_per_qam == 1:
        return q(math.sqrt(2 * esn0))
    k = spec.bits_per_qam
    # standard approximation for square M-QAM
    return (4 / k) * (1 - 1 / math.sqrt(m)) * q(
        math.sqrt(3 * esn0 / (m - 1)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="c2")
    p.add_argument("--snrs", default="6,10,14,18,22")
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--jsonl", default=None)
    args = p.parse_args()

    from ofdm_uhd_tpu.core.platform import force_cpu
    force_cpu()  # sweeps are host-side analysis; never contend for the TPU
    from ofdm_uhd_tpu.core.spec import ChannelSpec
    from ofdm_uhd_tpu.channel import apply_channel
    from ofdm_uhd_tpu.pipeline import TxPipeline, RxPipeline
    from ofdm_uhd_tpu.phy import qam as PQ
    from ofdm_uhd_tpu.phy import tables as T

    spec = C.load_spec(args.config)
    rng = np.random.default_rng(args.seed)
    payloads = rng.integers(
        0, 2, (args.frames, spec.payload_bits_per_frame)).astype(np.uint8)
    tx = TxPipeline(spec)
    frames = np.asarray(tx(payloads))
    coded_ref = np.asarray(tx.encode(payloads))
    rx = RxPipeline(spec, shift=min(4, spec.cp // 4))

    print(f"{'SNR dB':>7}{'preBER':>12}{'theory':>12}{'postFER':>10}"
          f"{'EVM dB':>9}")
    for snr in [float(s) for s in args.snrs.split(",")]:
        ch = ChannelSpec(snr_db=snr)
        rx_in = np.stack([
            apply_channel(frames[i], ch, spec.n_sc, seed=1000 + i)
            for i in range(args.frames)])
        out = rx.rx_aligned(rx_in)
        # pre-FEC BER: hard decisions on the equalized constellation
        hard = np.asarray(PQ.qam_demap_hard(out["data_syms"],
                                            spec.modulation))
        hard = hard.reshape(args.frames, -1)
        pre_ber = float(np.mean(hard != coded_ref))
        ok = np.asarray(out["crc_ok"])
        exact = np.array([np.array_equal(a, b) for a, b in
                          zip(np.asarray(out["payload"]), payloads)])
        fer = 1.0 - float(np.mean(ok & exact))
        evm = float(np.mean(np.asarray(out["evm_db"])))
        theo = uncoded_ber_theory(spec, snr)
        print(f"{snr:>7.1f}{pre_ber:>12.2e}{theo:>12.2e}{fer:>10.3f}"
              f"{evm:>9.1f}")
        if args.jsonl:
            with open(args.jsonl, "a") as f:
                f.write(json.dumps({"config": args.config, "snr_db": snr,
                                    "pre_fec_ber": pre_ber,
                                    "theory_ber": theo, "post_fec_fer": fer,
                                    "evm_db": evm}) + "\n")


if __name__ == "__main__":
    main()
