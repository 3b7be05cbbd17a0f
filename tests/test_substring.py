"""Winnowing fingerprints + exact-substring dedup (north rule's
suffix-array-equivalent path)."""

import random

import numpy as np

from rabbittclust_spark.config import PipelineConfig
from rabbittclust_spark.functions.winnowing import winnow_fingerprints
from rabbittclust_spark.operators.substring import substring_dedup, substring_pairs, sketch_winnow

CFG = PipelineConfig(min_len=50, max_posting=None)


def _doc(rng, n=500):
    return " ".join(f"w{rng.randrange(5000):04d}" for _ in range(n))


def test_winnow_guarantee_shared_substring():
    """Docs sharing an exact substring >= window+k-1 chars MUST share a
    fingerprint (the winnowing guarantee)."""
    rng = random.Random(1)
    shared = _doc(rng, 40)  # ~200 chars >> 50+21-1
    a = _doc(rng, 100) + " " + shared + " " + _doc(rng, 100)
    b = _doc(rng, 80) + " " + shared + " " + _doc(rng, 120)
    fa = winnow_fingerprints(a, k=21, window=50)
    fb = winnow_fingerprints(b, k=21, window=50)
    assert len(np.intersect1d(fa, fb)) >= 1


def test_winnow_short_doc_and_empty():
    assert len(winnow_fingerprints("", 21, 50)) == 0
    f = winnow_fingerprints("x" * 30, 21, 50)  # fewer hashes than window
    assert len(f) == 1


def test_containment_slice_detected(spark):
    """A verbatim slice has containment ~1.0 with its source."""
    rng = random.Random(2)
    base = _doc(rng, 400)
    toks = base.split()
    part = " ".join(toks[50:250])   # 50% slice
    other = _doc(random.Random(99), 400)
    docs = spark.createDataFrame(
        [(1, base), (2, part), (3, other)], "doc_id long, text string")
    fp = sketch_winnow(docs, CFG)
    pairs = {(r.src, r.dst): r.containment
             for r in substring_pairs(fp, CFG, min_containment=0.5).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] > 0.9
    assert not any(3 in p for p in pairs)


def test_substring_dedup_assignments(spark):
    rng = random.Random(3)
    base = _doc(rng, 400)
    part = " ".join(base.split()[:200])
    docs = spark.createDataFrame(
        [(1, base), (2, part), (3, _doc(random.Random(7), 400))],
        "doc_id long, text string")
    got = {r.doc_id: r.cluster_id
           for r in substring_dedup(docs, CFG).collect()}
    assert got[1] == got[2] == 1
    assert got[3] == 3
