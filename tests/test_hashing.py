"""Unit tests: rolling-hash shingling (SURVEY.md §5 test plan item 1)."""

import numpy as np

from rabbittclust_spark.functions.hashing import (
    rolling_window_hashes,
    shingle_hashes,
    splitmix64,
)

B = 1099511628211
M = 1 << 64


def _brute_poly(d: bytes) -> int:
    h = 0
    for c in d:
        h = (h * B + c) % M
    return h


def test_rolling_matches_bruteforce():
    data = "the quick brown fox jumps over the lazy dog 0123456789".encode()
    for k in (1, 3, 7, 21):
        exp = splitmix64(np.array(
            [_brute_poly(data[i:i + k]) for i in range(len(data) - k + 1)],
            dtype=np.uint64))
        got = rolling_window_hashes(data, k)
        assert np.array_equal(got, exp), f"k={k}"


def test_short_input_empty():
    assert len(rolling_window_hashes(b"ab", 5)) == 0
    assert len(shingle_hashes("", 5)) == 0


def test_seed_changes_hashes():
    h0 = rolling_window_hashes(b"hello world hello", 5, seed=0)
    h1 = rolling_window_hashes(b"hello world hello", 5, seed=23)
    assert not np.array_equal(h0, h1)


def test_shingle_hashes_sorted_distinct():
    h = shingle_hashes("abcabcabcabc", 3)
    assert np.array_equal(h, np.unique(h))
    # "abcabcabcabc" has only 3 distinct 3-shingles: abc, bca, cab
    assert len(h) == 3


def test_determinism_across_calls():
    a = shingle_hashes("some deterministic text " * 10, 21, seed=23)
    b = shingle_hashes("some deterministic text " * 10, 21, seed=23)
    assert np.array_equal(a, b)


def test_lowercase_normalization():
    a = shingle_hashes("Hello World Hello World!", 5, lowercase=True)
    b = shingle_hashes("hello world hello world!", 5, lowercase=False)
    assert np.array_equal(a, b)
