"""Self-auditing kernel policy (VERDICT r3 item 5).

kernels/policy.py's `_PALLAS_WINS` table claims to encode the MEASURED
per-(kernel, size, regime) winner from the floor-free net A/B
(bench/results/kab_r*net.jsonl). Nothing else stops a kernel change from
silently invalidating that claim — so this test re-derives every winner
from the NEWEST committed net jsonl and fails loudly when the policy and
the measurement disagree. Re-run `python bench/kernels_ab.py --jsonl
bench/results/kab_rXnet.jsonl` on-chip after kernel changes, commit the
jsonl, and update `_PALLAS_WINS` until this test is green again.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

from ofdm_uhd_tpu.kernels.policy import choose

_RESULTS = os.path.join(os.path.dirname(__file__), "..", "..",
                        "bench", "results")

# jsonl row name -> (policy kernel key, size, n) ; n = the batch/sample
# regime the row measured (None when the dispatcher doesn't plumb one).
# bench/kernels_ab.py's default viterbi batch is 130 (the C3 single-capture
# latency regime); batch-sweep rows carry an explicit -bN suffix.
_NAME_RE = [
    (re.compile(r"^fft-(\d+)$"), lambda m: ("fft", int(m[1]), None)),
    (re.compile(r"^cpfft-(\d+)$"), lambda m: ("cpfft", int(m[1]), None)),
    (re.compile(r"^ifftcp-(\d+)$"), lambda m: ("ifftcp", int(m[1]), None)),
    (re.compile(r"^fir-(\d+)t$"), lambda m: ("fir", int(m[1]), None)),
    (re.compile(r"^decim-(\d+)x$"), lambda m: ("decim", int(m[1]), 1 << 20)),
    (re.compile(r"^interp-(\d+)x$"), lambda m: ("interp", int(m[1]), 1 << 20)),
    (re.compile(r"^sc-corr-(\d+)$"), lambda m: ("sc_corr", int(m[1]), None)),
    (re.compile(r"^viterbi-(\d+)$"), lambda m: ("viterbi", int(m[1]), 130)),
    (re.compile(r"^viterbi-(\d+)-b(\d+)$"),
     lambda m: ("viterbi", int(m[1]), int(m[2]))),
]

# viterbi rows feed the dedicated three-way algorithm audit below, not
# the backend-table loop.
_SKIP = re.compile(r"^viterbi")

# The net slope's session-to-session jitter: treat |speedup - 1| below
# this as a tie either backend may take.
_TIE_BAND = 0.10


def _newest_net_jsonl() -> str:
    paths = sorted(glob.glob(os.path.join(_RESULTS, "kab_r*net.jsonl")))
    if not paths:
        pytest.skip("no committed kab_r*net.jsonl")
    return paths[-1]


def _parse(name: str):
    for rx, fn in _NAME_RE:
        m = rx.match(name)
        if m:
            return fn(m)
    return None


def test_policy_matches_newest_net_bench():
    path = _newest_net_jsonl()
    rows = [json.loads(ln) for ln in open(path) if ln.strip()]
    # keep the LAST row per kernel name (reruns append)
    by_name: dict[str, dict] = {}
    for r in rows:
        if "kernel" in r:
            by_name[r["kernel"]] = r
    checked, problems = 0, []
    for name, r in sorted(by_name.items()):
        if _SKIP.match(name):
            continue
        key = _parse(name)
        if key is None:
            continue          # new bench row kinds don't break old policy
        kernel, size, n = key
        x, p = r.get("xla_net_ms"), r.get("pallas_net_ms")
        if x is None or p is None:
            # a backend failed net timing — policy must not pick it if it
            # failed outright (e.g. pallas compile error)
            if x is not None and "pallas_error" in r:
                got = choose(kernel, size, "auto", n=n)
                if got != "xla":
                    problems.append(f"{name}: pallas FAILED but policy "
                                    f"chose {got}")
                checked += 1
            continue
        speedup = x / p
        if abs(speedup - 1.0) <= _TIE_BAND:
            continue          # tie band: either choice is defensible
        want = "pallas" if speedup > 1.0 else "xla"
        got = choose(kernel, size, "auto", n=n)
        checked += 1
        if got != want:
            problems.append(
                f"{name}: measured winner {want} (pallas/xla net "
                f"{speedup:.2f}x, {path}) but choose({kernel!r}, {size}, "
                f"'auto', n={n}) -> {got}")
    assert not problems, "\n".join(problems)
    # the audit must actually cover the table, not vacuously pass
    assert checked >= 6, f"only {checked} auditable rows in {path}"


def test_viterbi_impl_matches_newest_net_bench():
    """Three-way decoder-algorithm audit: for every measured batch, the
    argmin of {scan (viterbi-* xla), windowed (viterbi-win-*), fused
    (viterbi-* pallas)} must be what viterbi_impl('auto') picks."""
    from ofdm_uhd_tpu.kernels.policy import viterbi_impl
    path = _newest_net_jsonl()
    rows = [json.loads(ln) for ln in open(path) if ln.strip()]
    by_name = {}
    for r in rows:
        if "kernel" in r:
            by_name[r["kernel"]] = r
    grid = {}          # batch -> {impl: net_ms}
    for name, r in by_name.items():
        m = re.match(r"^viterbi(-win)?-(\d+)(?:-b(\d+))?$", name)
        if not m:
            continue
        win, size, b = m[1], int(m[2]), int(m[3] or 130)
        d = grid.setdefault(b, {})
        if win:
            if r.get("xla_net_ms") is not None:
                d["windowed"] = r["xla_net_ms"]
        else:
            if r.get("xla_net_ms") is not None:
                d["scan"] = r["xla_net_ms"]
            if r.get("pallas_net_ms") is not None:
                d["fused"] = r["pallas_net_ms"]
    checked, problems = 0, []
    for b, d in sorted(grid.items()):
        if len(d) < 2:
            continue
        best = min(d, key=d.get)
        second = sorted(d.values())[1]
        if second / d[best] - 1.0 <= _TIE_BAND:
            continue
        got = viterbi_impl(6912, b, "auto")
        checked += 1
        if got != best:
            problems.append(f"batch {b}: measured best {best} ({d}) but "
                            f"viterbi_impl -> {got}")
    assert not problems, "\n".join(problems)
    assert checked >= 2, f"only {checked} auditable viterbi batches in {path}"


def test_extract_policy_matches_chain_probe():
    """The 'extract' policy entry is justified by the CHAIN-level A/B
    (the isolated gather is fast; its win is de-pathologizing consumers
    — see bench/kernels_ab.py note): audit it against the committed
    r5_probe_extract jsonl's det+ext+CFO rows (full-g vs full-p)."""
    paths = sorted(glob.glob(os.path.join(_RESULTS,
                                          "r5_probe_extract*.jsonl")))
    if not paths:
        pytest.skip("no committed r5_probe_extract jsonl")
    rows = [json.loads(ln) for ln in open(paths[-1]) if ln.strip()]
    net = rows[-1]["net_ms"]
    g, p = net.get("full-g"), net.get("full-p")
    assert g is not None and p is not None
    if abs(g / p - 1.0) <= _TIE_BAND:
        pytest.skip("tie band")
    want = "pallas" if g > p else "xla"
    got = choose("extract", 4032, "auto")
    assert got == want, (f"chain probe winner {want} (full-g {g} vs "
                         f"full-p {p} ms) but policy chose {got}")


def test_viterbi_regime_routing():
    """Deep-latency -> fused, middle -> windowed, headline -> scan;
    unknown batch falls back conservatively to the scan; explicit
    backend requests are honored."""
    from ofdm_uhd_tpu.kernels.policy import viterbi_impl
    assert viterbi_impl(6912, 18, "auto") == "fused"      # streaming
    assert viterbi_impl(6912, 130, "auto") == "windowed"  # 1 capture
    assert viterbi_impl(6912, 4160, "auto") == "scan"     # headline
    assert viterbi_impl(6912, None, "auto") == "scan"
    assert viterbi_impl(6912, 4160, "pallas") == "fused"  # forced
    assert viterbi_impl(6912, 18, "xla", mode="windowed") == "windowed"
