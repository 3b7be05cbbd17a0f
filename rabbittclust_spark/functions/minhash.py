"""MinHash signatures (bottom-s sets, k-permutation arrays) + FracMinHash.

Bottom-s sketch semantics match the reference's Sketch::MinHash /
Sketch::KSSD surface: a sketch is a *sorted set of hash values*
(reference: src/SketchInfo.h:38-48 — "hash32_arr/hash64_arr sorted"), so
Jaccard is estimated as common/(n1+n2-common) over set intersections
(src/greedy.cpp:73-99, src/MST.cpp:514-519) and the inverted index is simply
hash-value -> posting list (src/SketchInfo.h:59-161).

The k-permutation positional signature is the scale-path extra: classic LSH
banding needs aligned positions, which bottom-s sets don't have.
"""

from __future__ import annotations

import numpy as np

from rabbittclust_spark.functions.hashing import shingle_hashes, splitmix64

_U64 = np.uint64


def bottom_s_sketch(text: str, k: int, s: int, seed: int = 0,
                    lowercase: bool = False) -> np.ndarray:
    """Bottom-s MinHash sketch: the s smallest distinct shingle hashes, sorted.

    Mash-style bottom sketch (reference call surface:
    src/SketchInfo.cpp:701-711 storeMinHashes()).  If the document has fewer
    than s distinct shingles the sketch is the whole (sorted) set — same
    behavior as a bottom sketch of a small set.
    """
    h = shingle_hashes(text, k, seed=seed, lowercase=lowercase)
    if len(h) > s:
        h = h[:s]  # shingle_hashes returns sorted ascending => first s = smallest
    return h


def containment_sketch_size(doc_len: int, contain_compress: int,
                            min_size: int = 100) -> int:
    """Variable sketch size for containment/AAF mode
    (reference: src/SketchInfo.cpp:703-707 — size = len/c, min 100)."""
    return max(int(doc_len // max(contain_compress, 1)), min_size)


def frac_minhash_sketch(text: str, k: int, scale: int, seed: int = 0,
                        lowercase: bool = False) -> np.ndarray:
    """FracMinHash: keep every distinct shingle hash < 2^64/scale, sorted.

    Analog of the reference's KSSD dimension-reduction predicate — keep a
    k-mer iff its center-context index falls in a fixed pseudo-random 1/16^dr
    subset (src/SketchInfo.cpp:60-102,376-386).  FracMinHash gives the same
    containment-supporting semantics with a single threshold test.
    """
    h = shingle_hashes(text, k, seed=seed, lowercase=lowercase)
    cutoff = _U64((1 << 64) // scale - 1)
    return h[h <= cutoff]


def kperm_signature(text: str, k: int, num_perm: int, perm_seed: int,
                    hash_seed: int = 0, lowercase: bool = False) -> np.ndarray:
    """k-permutation positional MinHash signature, length ``num_perm``.

    sig[p] = min over shingle hashes h of (a_p*h + b_p mod 2^64), with
    (a_p, b_p) drawn from a fixed-seed generator — deterministic across
    workers.  Used only by the banded-LSH scale path; empty documents get an
    all-max signature.
    """
    h = shingle_hashes(text, k, seed=hash_seed, lowercase=lowercase)
    a, b = _perm_params(num_perm, perm_seed)
    if len(h) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=_U64)
    # chunk to bound the (n_shingles x num_perm) temporary
    out = np.full(num_perm, np.iinfo(np.uint64).max, dtype=_U64)
    step = max(1, (1 << 20) // num_perm)
    for i in range(0, len(h), step):
        chunk = h[i:i + step, None] * a[None, :] + b[None, :]
        np.minimum(out, chunk.min(axis=0), out=out)
    return out


def _perm_params(num_perm: int, perm_seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Fixed multipliers/offsets for k-perm minhash (a odd => bijective)."""
    base = np.arange(1, num_perm + 1, dtype=_U64) + _U64(perm_seed & 0xFFFFFFFF)
    a = splitmix64(base) | _U64(1)
    b = splitmix64(base + _U64(0x9E3779B97F4A7C15))
    return a, b


def band_hashes(sig: np.ndarray, rows_per_band: int) -> np.ndarray:
    """Hash each band (r consecutive signature positions) to one uint64.

    Returns array of length num_perm // rows_per_band.  Band key = splitmix64
    fold of the r values with the band index mixed in (so identical values in
    different bands don't collide).
    """
    b = len(sig) // rows_per_band
    bands = sig[: b * rows_per_band].reshape(b, rows_per_band)
    acc = np.arange(b, dtype=_U64) * _U64(0x9E3779B97F4A7C15)
    for r in range(rows_per_band):
        acc = splitmix64(acc ^ bands[:, r])
    return acc


# --------------------------------------------------------------------------
# set-sketch math (shared by the numpy oracle and tests; Spark computes the
# same quantities as column expressions in functions/distances.py)
# --------------------------------------------------------------------------

def sketch_common(a: np.ndarray, b: np.ndarray) -> int:
    """Exact intersection size of two sorted hash-set sketches
    (reference merge-intersection: src/greedy.cpp:39-67,73-99)."""
    return int(len(np.intersect1d(a, b, assume_unique=True)))


def jaccard_from_common(common: int, n1: int, n2: int) -> float:
    """J = common/(n1+n2-common); 0 if denominator 0
    (reference: src/greedy.cpp:73-99, src/MST.cpp:514-519)."""
    denom = n1 + n2 - common
    return common / denom if denom > 0 else 0.0


def mash_distance(j: float, k: int) -> float:
    """Mash D = -(1/k)*ln(2J/(1+J)); J=1 -> 0, J<=0 -> 1, clamped to <= 1
    (reference: src/MST.cpp:520-528)."""
    if j >= 1.0:
        return 0.0
    if j <= 0.0:
        return 1.0
    import math
    return min(1.0, -math.log(2.0 * j / (1.0 + j)) / k)


def containment_distance(common: int, n1: int, n2: int, k: int) -> float:
    """AAF distance D = -(1/k)*ln(c), c = common/min(n1,n2)
    (reference: src/MST.cpp:529-540)."""
    import math
    m = min(n1, n2)
    if m <= 0 or common <= 0:
        return 1.0
    c = common / m
    if c >= 1.0:
        return 0.0
    return min(1.0, -math.log(c) / k)
