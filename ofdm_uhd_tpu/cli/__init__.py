"""CLI entry points (layer T6) — the ofdm_tx / ofdm_rx / benchmark binaries
of the reference-class system (SURVEY.md §1.1 L5; mount empty, §0), as
python -m modules:

    python -m ofdm_uhd_tpu.cli.tx       --config c2 --out tx.npy --frames 10
    python -m ofdm_uhd_tpu.cli.rx       --config c3 --capture rx.npy
    python -m ofdm_uhd_tpu.cli.loopback --config c1 --frames 100 --snr 12
    python -m ofdm_uhd_tpu.cli.pod_rx   --config c5 --capture rx.npy
    python -m ofdm_uhd_tpu.cli.bench    --config c3
"""
