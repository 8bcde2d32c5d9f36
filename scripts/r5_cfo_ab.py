"""C5 resident-capacity A/B: shard-step CFO order two_ramp vs fused
(ADVICE r4 item 3 follow-up), same invocation as the r5.jsonl rows."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ofdm_uhd_tpu.shard.time_parallel as TP
from ofdm_uhd_tpu.cli import bench

TP.CFO_ORDER = sys.argv[1]
print(f"# CFO_ORDER={TP.CFO_ORDER}", flush=True)
bench.main(["--config", "c5", "--mode", "stream", "--frames", "4096",
            "--chunk", "8257536", "--ksteps", "2", "--resident",
            "--iters", "3", "--set", "kernel_backend=auto",
            "--jsonl", "bench/results/r5_cfo_ab.jsonl"])
