"""Winnowing document fingerprints for exact-substring duplicate detection.

The north rule lists suffix-array substring matching as the third signature
family.  The web-scale equivalent (same guarantee, bounded state, no global
index build) is winnowing (Schleimer, Wilkerson, Aiken, SIGMOD 2003 — the
MOSS fingerprinting algorithm): slide a window of ``w`` consecutive k-gram
hashes and keep each window's minimum (rightmost on ties).

Guarantee: any exact shared substring of length >= w + k - 1 between two
documents produces at least one shared fingerprint, so the fingerprint
explode-join finds every such pair — the distributed analog of a suffix-array
LCP scan.  The containment score shared/|fp(shorter)| then estimates how much
of the shorter document is covered (cf. the reference's AAF containment
distance, src/MST.cpp:529-540).
"""

from __future__ import annotations

import numpy as np

from rabbittclust_spark.functions.hashing import rolling_window_hashes

_U64 = np.uint64


def winnow_fingerprints(text: str, k: int = 21, window: int = 50,
                        seed: int = 0) -> np.ndarray:
    """Distinct winnowing fingerprints of ``text`` (sorted uint64).

    Detects shared exact substrings of length >= window + k - 1
    (defaults: >= 70 characters).
    """
    h = rolling_window_hashes(text.encode("utf-8"), k, seed=seed)
    m = len(h)
    if m == 0:
        return np.empty(0, dtype=_U64)
    if m <= window:
        return np.unique(h.min(keepdims=True))
    # sliding-window minimum, rightmost on ties: reverse, argmin picks the
    # first (== rightmost in original order) among equals
    win = np.lib.stride_tricks.sliding_window_view(h, window)
    mins = win.min(axis=1)
    return np.unique(mins)
