"""Property-based tests (hypothesis) over the pure numpy kernels —
breadth beyond the hand-picked fixtures, no Spark session needed."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rabbittclust_spark.functions.hashing import rolling_window_hashes, splitmix64
from rabbittclust_spark.functions.minhash import (
    jaccard_from_common,
    mash_distance,
    weighted_jaccard,
)
from rabbittclust_spark.functions.simhash import hamming64, simhash_blocks

TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    min_size=0, max_size=200)


@settings(max_examples=40, deadline=None)
@given(TEXT, st.integers(min_value=1, max_value=12))
def test_rolling_hash_matches_per_window_hash(text, k):
    """The O(n) cumulative rolling hash == hashing each window in isolation
    (the definition it vectorizes)."""
    data = text.encode("utf-8")
    got = rolling_window_hashes(data, k)
    n = len(data)
    assert len(got) == max(0, n - k + 1)
    for i in range(len(got)):
        solo = rolling_window_hashes(data[i:i + k], k)
        assert len(solo) == 1 and solo[0] == got[i], i


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 64) - 1),
       st.integers(min_value=2, max_value=64))
def test_simhash_blocks_partition_all_bits(sig, nb):
    """Blocks reconstruct the signature exactly (a disjoint cover of the 64
    bits) and carry non-overlapping position tags."""
    blocks = simhash_blocks(sig, nb)
    assert len(blocks) == nb
    assert len({b >> 56 for b in blocks}) == nb  # distinct position tags
    width = 64 // nb
    extra = 64 % nb
    rebuilt, pos = 0, 0
    for i, b in enumerate(blocks):
        w = width + (1 if i < extra else 0)
        rebuilt |= (b & ((1 << w) - 1)) << pos
        pos += w
    assert rebuilt == sig


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 64) - 1),
       st.integers(min_value=1, max_value=6),
       st.data())
def test_simhash_pigeonhole_recall(sig, hmax, data):
    """Any pair within Hamming distance hmax shares >= 1 of (hmax+1) blocks."""
    flips = data.draw(st.sets(st.integers(min_value=0, max_value=63),
                              min_size=0, max_size=hmax))
    other = sig
    for f in flips:
        other ^= 1 << f
    assert hamming64(sig, other) <= hmax
    assert set(simhash_blocks(sig, hmax + 1)) & set(simhash_blocks(other, hmax + 1))


@settings(max_examples=100, deadline=None)
@given(st.floats(min_value=0.0, max_value=1.0),
       st.floats(min_value=0.0, max_value=1.0),
       st.integers(min_value=1, max_value=64))
def test_mash_distance_monotone_and_bounded(j1, j2, k):
    """D(j) is within [0,1] and non-increasing in j (higher similarity never
    increases distance) — the property every pruning bound relies on."""
    d1, d2 = mash_distance(j1, k), mash_distance(j2, k)
    assert 0.0 <= d1 <= 1.0 and 0.0 <= d2 <= 1.0
    if j1 < j2:
        assert d1 >= d2 - 1e-12


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=500),
       st.integers(min_value=0, max_value=500),
       st.integers(min_value=0, max_value=500))
def test_jaccard_from_common_bounds(common, extra1, extra2):
    n1, n2 = common + extra1, common + extra2
    j = jaccard_from_common(common, n1, n2)
    assert 0.0 <= j <= 1.0
    if n1 and n1 == n2 == common:
        assert j == 1.0


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=1 << 62),
                          st.floats(min_value=0.5, max_value=100.0)),
                min_size=0, max_size=60, unique_by=lambda t: t[0]),
       st.lists(st.tuples(st.integers(min_value=0, max_value=1 << 62),
                          st.floats(min_value=0.5, max_value=100.0)),
                min_size=0, max_size=60, unique_by=lambda t: t[0]))
def test_weighted_jaccard_symmetric_bounded(s1, s2):
    def prep(s):
        s = sorted(s)
        return (np.array([x for x, _ in s], dtype=np.uint64),
                np.array([w for _, w in s], dtype=np.float64))
    h1, w1 = prep(s1)
    h2, w2 = prep(s2)
    a = weighted_jaccard(h1, w1, h2, w2)
    b = weighted_jaccard(h2, w2, h1, w1)
    assert math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)
    assert 0.0 <= a <= 1.0
    if len(h1) and np.array_equal(h1, h2) and np.array_equal(w1, w2):
        assert math.isclose(a, 1.0)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=200))
def test_splitmix64_is_a_bijection_sample(xs):
    """splitmix64 must be injective (it is a bijection on uint64) — key
    derivations all rely on collision-freeness of the finalizer."""
    arr = np.array(sorted(set(xs)), dtype=np.uint64)
    out = splitmix64(arr)
    assert len(np.unique(out)) == len(arr)
