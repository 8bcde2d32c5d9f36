"""_select_doubling (parallel successor-matrix selection) must be
BIT-IDENTICAL to _select_scan (the sequential oracle) — the r4 detection
speedup is pure re-expression, not a semantics change."""

import numpy as np
import pytest
import jax.numpy as jnp

from ofdm_uhd_tpu.core.spec import config
from ofdm_uhd_tpu.phy.sync import _select_scan, _select_doubling


@pytest.mark.parametrize("seed", range(24))
def test_doubling_equals_scan_random(seed):
    spec = config("c3")
    rng = np.random.default_rng(seed)
    # last seeds force MULTI-BLOCK sizes (> _SEL_KB=256) so the
    # cross-block (pos, dead) carry is exercised
    m = int(rng.integers(4, 80)) if seed < 18 else int(rng.integers(300, 700))
    nd = 200000
    # random ascending candidate positions with clusters (same-plateau
    # re-crossings), sentinel tail, random validity
    n_found = int(rng.integers(0, m + 1))
    base = np.sort(rng.integers(0, nd, n_found))
    # inject near-duplicates to emulate plateau re-crossings
    if n_found > 2:
        base[1] = base[0] + int(rng.integers(1, spec.sym_len))
    cand = np.concatenate([base, np.full(m - n_found, nd)]).astype(np.int32)
    ds = np.maximum(cand - int(rng.integers(0, spec.cp + 1)), 0)
    valid = rng.random(m) < 0.8
    found = cand < nd
    slack = spec.sym_len
    a = np.asarray(_select_scan(spec, jnp.asarray(cand), jnp.asarray(ds),
                                jnp.asarray(valid), jnp.asarray(found),
                                slack))
    b = np.asarray(_select_doubling(spec, jnp.asarray(cand),
                                    jnp.asarray(ds), jnp.asarray(valid),
                                    jnp.asarray(found), slack))
    np.testing.assert_array_equal(a, b)


def test_doubling_dead_halt():
    """An eligible-but-invalid candidate halts the chain (frame past the
    capture end) — nothing after it may be kept."""
    spec = config("c1")
    cand = jnp.asarray([100, 100 + spec.frame_len + 10,
                        100 + 2 * spec.frame_len + 20], jnp.int32)
    ds = cand
    valid = jnp.asarray([True, False, True])
    found = jnp.asarray([True, True, True])
    a = np.asarray(_select_scan(spec, cand, ds, valid, found, spec.sym_len))
    b = np.asarray(_select_doubling(spec, cand, ds, valid, found,
                                    spec.sym_len))
    np.testing.assert_array_equal(a, b)
    assert list(b) == [True, False, False]


@pytest.mark.parametrize("seed", range(10))
def test_first_k_indices_matches_topk(seed):
    """Hierarchical extraction == direct top_k whenever <= _EXTRACT_S
    rises per 512-block (every non-adversarial bitmap)."""
    from ofdm_uhd_tpu.phy.sync import _first_k_indices
    import jax
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(20000, 80000))
    rise = np.zeros(n, bool)
    # sparse rises (well under the 8-per-512-block capacity) with
    # occasional small clusters
    pts = rng.choice(n // 512, size=int(rng.integers(0, 40)),
                     replace=False) * 512 + rng.integers(0, 500)
    rise[pts] = True
    for p in pts[:5]:
        rise[min(n - 1, p + int(rng.integers(1, 12)))] = True
    k = 64
    idx = jnp.where(jnp.asarray(rise), jnp.arange(n, dtype=jnp.int32),
                    jnp.int32(n))
    ref = np.asarray(-jax.lax.top_k(-idx, k)[0])
    got = np.asarray(_first_k_indices(jnp.asarray(rise), k, sentinel=n))
    np.testing.assert_array_equal(got, ref)


def test_first_k_indices_saturation_flag():
    """with_sat surfaces per-block capacity overflow (ADVICE r4): a dense
    block trips the flag; a sparse bitmap does not."""
    from ofdm_uhd_tpu.phy.sync import _EXTRACT_S, _first_k_indices
    n = 4096
    sparse = np.zeros(n, bool)
    sparse[[100, 700, 1500, 3000]] = True
    _, sat = _first_k_indices(jnp.asarray(sparse), 16, sentinel=n,
                              with_sat=True)
    assert not bool(sat)
    dense = sparse.copy()
    dense[200:200 + 2 * (_EXTRACT_S + 1):2] = True   # one overfull block
    idx, sat = _first_k_indices(jnp.asarray(dense), 16, sentinel=n,
                                with_sat=True)
    assert bool(sat)
    # and it propagates through detect_frames' optional 4-tuple
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from bench_lib import build_capture
    from ofdm_uhd_tpu.core.spec import config
    from ofdm_uhd_tpu.phy.sync import detect_frames
    spec = config("c1")
    cap, _ = build_capture(spec, 2, gap=300)
    out = detect_frames(spec, jnp.asarray(cap), 4, with_sat=True)
    assert len(out) == 4 and not bool(out[3])
    assert int(np.sum(np.asarray(out[2]))) == 2
