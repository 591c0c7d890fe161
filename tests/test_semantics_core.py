"""Unit tests for the numpy semantics core against brute-force oracles
(SURVEY.md §5.2)."""
import numpy as np
import pytest

from pangea_tpu.core import (
    canonical_kmers, encode_bases, hash32_np, minimizer_mask, revcomp_codes,
)


def brute_canonical(codes, k):
    """Independent scalar oracle for SEMANTICS.md §2."""
    L = len(codes)
    P = max(L - k + 1, 0)
    canon = np.zeros(P, dtype=np.uint64)
    valid = np.zeros(P, dtype=bool)
    for i in range(P):
        window = codes[i:i + k]
        if (window > 3).any():
            continue
        fwd = 0
        for b in window:
            fwd = (fwd << 2) | int(b)
        rc = 0
        for b in window[::-1]:
            rc = (rc << 2) | (3 - int(b))
        canon[i] = min(fwd, rc)
        valid[i] = True
    return canon, valid


def test_encode_bases():
    codes = encode_bases("ACGTUacgtuNnX-*")
    assert list(codes) == [0, 1, 2, 3, 3, 0, 1, 2, 3, 3, 4, 4, 4, 4, 4]


def test_revcomp():
    codes = encode_bases("ACGTN")
    rc = revcomp_codes(codes)
    assert list(rc) == [4, 0, 1, 2, 3]  # N stays ambiguous


@pytest.mark.parametrize("k", [3, 5, 21, 31])
@pytest.mark.parametrize("seed", [0, 1])
def test_canonical_vs_brute(k, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 5, size=200).astype(np.uint8)  # includes AMBIG
    canon, valid = canonical_kmers(codes, k)
    bc, bv = brute_canonical(codes, k)
    np.testing.assert_array_equal(valid, bv)
    np.testing.assert_array_equal(canon[valid], bc[bv])


def test_canonical_revcomp_invariance():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=100).astype(np.uint8)
    c1, v1 = canonical_kmers(codes, 21)
    c2, v2 = canonical_kmers(revcomp_codes(codes), 21)
    np.testing.assert_array_equal(np.sort(c1[v1]), np.sort(c2[v2]))


def test_short_sequence():
    canon, valid = canonical_kmers(np.zeros(5, np.uint8), 21)
    assert canon.shape == (0,) and valid.shape == (0,)


def test_hash32_reference_values():
    # Frozen constants: these pin SEMANTICS.md §4 forever (any change to the
    # hash breaks index compatibility and must bump SEMANTICS_VERSION).
    got = hash32_np(np.array([0, 1, 0xDEADBEEF, (1 << 62) - 1], np.uint64))
    assert got.dtype == np.uint32
    # Independent recomputation with python ints:
    def mix(v):
        v ^= v >> 16; v = (v * 0x85EBCA6B) & 0xFFFFFFFF
        v ^= v >> 13; v = (v * 0xC2B2AE35) & 0xFFFFFFFF
        v ^= v >> 16
        return v
    for x, g in zip([0, 1, 0xDEADBEEF, (1 << 62) - 1], got):
        h = mix((x & 0xFFFFFFFF) ^ 0x9E3779B9)
        h = mix(h ^ (x >> 32))
        assert h == int(g)


def test_minimizer_mask_w1_is_valid():
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 5, size=300).astype(np.uint8)
    canon, valid = canonical_kmers(codes, 15)
    np.testing.assert_array_equal(minimizer_mask(canon, valid, 1), valid)


def test_minimizer_mask_properties():
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=500).astype(np.uint8)
    k, w = 15, 8
    canon, valid = canonical_kmers(codes, k)
    sel = minimizer_mask(canon, valid, w)
    assert sel.sum() > 0
    assert not (sel & ~valid).any()
    # Every full window of w valid positions contains a selected position.
    P = len(canon)
    for s in range(P - w + 1):
        if valid[s:s + w].all():
            assert sel[s:s + w].any()
    # Selected positions are window-minimal by hash.
    h = hash32_np(canon)
    for i in np.flatnonzero(sel):
        lo = max(0, i - w + 1)
        ok = False
        for s in range(lo, min(i + 1, P - w + 1)):
            win = h[s:s + w]
            if valid[s:s + w].all() and s + int(np.argmin(win)) == i:
                ok = True
        assert ok
