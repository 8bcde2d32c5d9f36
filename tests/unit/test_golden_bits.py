"""Golden bit-layer validation from first principles (SURVEY.md §4, M0)."""

import numpy as np
import pytest

from ofdm_uhd_tpu.golden import bits as B
from ofdm_uhd_tpu.core.spec import TAIL_BITS

RNG = np.random.default_rng(1234)


def test_scramble_is_involution():
    b = RNG.integers(0, 2, 500).astype(np.uint8)
    assert np.array_equal(B.descramble(B.scramble(b)), b)
    assert not np.array_equal(B.scramble(b), b)  # actually whitens


def test_lfsr_period_127():
    seq = B.lfsr_sequence(254)
    assert np.array_equal(seq[:127], seq[127:])
    assert seq[:127].sum() == 64  # maximal-length property: 64 ones


def test_crc32_detects_errors():
    b = RNG.integers(0, 2, 200).astype(np.uint8)
    crc = B.crc32_bits(b)
    assert len(crc) == 32
    b2 = b.copy()
    b2[17] ^= 1
    assert not np.array_equal(B.crc32_bits(b2), crc)


def test_crc32_matrix_matches_bitwise():
    n = 100
    m, c = B.crc32_matrix(n)
    for _ in range(5):
        b = RNG.integers(0, 2, n).astype(np.uint8)
        assert np.array_equal((m @ b + c) % 2, B.crc32_bits(b))


def test_conv_encode_known_impulse():
    # impulse response = generator polynomials
    b = np.zeros(7, dtype=np.uint8)
    b[0] = 1
    out = B.conv_encode(b)
    # g0 = 1011011, g1 = 1111001 (MSB = current bit)
    assert np.array_equal(out[0::2], [1, 0, 1, 1, 0, 1, 1])
    assert np.array_equal(out[1::2], [1, 1, 1, 1, 0, 0, 1])


@pytest.mark.parametrize("n", [64, 571])
def test_viterbi_noiseless_roundtrip(n):
    b = RNG.integers(0, 2, n).astype(np.uint8)
    msg = np.concatenate([b, np.zeros(TAIL_BITS, dtype=np.uint8)])
    coded = B.conv_encode(msg)
    llr = 1.0 - 2.0 * coded.astype(np.float64)  # perfect LLRs
    dec = B.viterbi_decode(llr)
    assert np.array_equal(dec[:n], b)


def test_viterbi_corrects_errors():
    n = 400
    b = RNG.integers(0, 2, n).astype(np.uint8)
    msg = np.concatenate([b, np.zeros(TAIL_BITS, dtype=np.uint8)])
    coded = B.conv_encode(msg)
    llr = 1.0 - 2.0 * coded.astype(np.float64)
    # isolated flips every 40 coded bits — always correctable by K=7 rate-1/2
    # (free distance 10; single errors per constraint span are trivial)
    llr[7::40] *= -1.0
    dec = B.viterbi_decode(llr)
    assert np.array_equal(dec[:n], b)
    # soft information helps: attenuated (unreliable) wrong bits also decode
    llr2 = 1.0 - 2.0 * coded.astype(np.float64)
    llr2[5::17] *= -0.25
    dec2 = B.viterbi_decode(llr2)
    assert np.array_equal(dec2[:n], b)


def test_interleave_roundtrip():
    n_cbps = 96
    b = RNG.integers(0, 2, n_cbps * 12).astype(np.uint8)
    assert np.array_equal(B.deinterleave(B.interleave(b, n_cbps), n_cbps), b)
    # spreads adjacency: consecutive coded bits land >= n_cbps/16 apart
    perm = B.interleave_perm(n_cbps)
    assert np.min(np.abs(np.diff(perm))) >= n_cbps // 16
