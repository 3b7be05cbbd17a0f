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
    return kperm_signature_from_hashes(h, num_perm, perm_seed)


def kperm_signature_from_hashes(h: np.ndarray, num_perm: int,
                                perm_seed: int) -> np.ndarray:
    """:func:`kperm_signature` over precomputed shingle hashes — lets the
    fused sketch kernel share one shingling pass between the bottom-s sketch
    and the banded signature (bit-identical to the text entry point)."""
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
# weighted MinHash (ICWS) — the reference's Sketch::WMinHash alternative
# sketch family (call surface: src/SketchInfo.cpp:130-141, 240-255; dispatch
# src/MST.cpp:856-881).  Ioffe, "Improved Consistent Sampling, Weighted
# Minhash and L1 Sketching" (ICDM 2010): for each sample p and weighted
# element (x, w), with per-(x, p) randomness r, c ~ Gamma(2,1),
# beta ~ U(0,1):
#     t   = floor(ln w / r + beta)
#     lnY = r * (t - beta)
#     lnA = ln c - lnY - r
# pick argmin lnA; the signature element is the pair (x, t).  Two documents'
# sample-p elements collide with probability = weighted Jaccard
# sum(min w)/sum(max w).  All randomness is counter-hash derived (splitmix64)
# so signatures are deterministic across workers.
# --------------------------------------------------------------------------


def shingle_hash_counts(text: str, k: int, seed: int = 0,
                        lowercase: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """(unique shingle hashes sorted, multiplicities) — the weighted set the
    reference's WMinHash consumes (k-mer counts)."""
    if lowercase:
        text = text.lower()
    from rabbittclust_spark.functions.hashing import rolling_window_hashes
    h = rolling_window_hashes(text.encode("utf-8"), k, seed=seed)
    return np.unique(h, return_counts=True)


def _u01(x: np.ndarray) -> np.ndarray:
    """uint64 -> uniform double in (0, 1)."""
    return ((x >> np.uint64(11)).astype(np.float64) + 0.5) * (2.0 ** -53)


def icws_signature(hashes: np.ndarray, weights: np.ndarray, num_samples: int,
                   seed: int = 0) -> np.ndarray:
    """ICWS weighted-MinHash signature: ``num_samples`` uint64 keys, each a
    hash of the sampled (element, t) pair.  Empty input -> all-max keys.

    Fully 2-D vectorized over (samples x elements) — the r7-benched
    per-sample Python loop was ~6 tiny splitmix calls per sample per doc
    and dominated the production wminhash_pairs wall (54 s at sf0.1, 10x
    the family).  Every elementwise formula, the counter-hash derivation,
    and the argmin tie-break (first index) are unchanged, so signatures
    are bit-identical to the loop version; sample rows are independent, so
    chunking over samples bounds the transient (chunk x n) matrices
    without changing values."""
    s = int(num_samples)
    if len(hashes) == 0:
        return np.full(s, np.iinfo(np.uint64).max, dtype=_U64)
    h = hashes.astype(_U64)
    n = len(h)
    lnw = np.log(weights.astype(np.float64))[None, :]
    out = np.empty(s, dtype=_U64)
    base = _U64((seed * 0x9E3779B9 + 0x85EBCA6B) & 0xFFFFFFFFFFFFFFFF)
    kp_all = splitmix64(base + np.arange(s, dtype=_U64))
    chunk = max(1, 4_000_000 // n)           # ~30 MB float64 temporaries
    for c0 in range(0, s, chunk):
        kp = kp_all[c0:c0 + chunk]

        def _u(i: int) -> np.ndarray:
            ki = splitmix64(kp + _U64(i))
            return _u01(splitmix64(h[None, :] ^ ki[:, None]))

        r = -(np.log(_u(0)) + np.log(_u(1)))     # Gamma(2,1)
        ln_c = np.log(-(np.log(_u(2)) + np.log(_u(3))))
        beta = _u(4)
        t = np.floor(lnw / r + beta)
        ln_a = ln_c - r * (t - beta) - r
        idx = np.argmin(ln_a, axis=1)            # first-min, as 1-D argmin
        rows = np.arange(len(idx))
        # int(float) truncates toward zero; int64 cast matches for |t| far
        # below 2^63 (t = floor(lnw/r + beta), bounded by counts), and the
        # uint64 view reproduces the Python & 0xFFFF... two's-complement wrap
        tkey = splitmix64(t[rows, idx].astype(np.int64).view(_U64))
        out[c0:c0 + chunk] = splitmix64(h[idx] ^ tkey)
    return out


def weighted_jaccard(h1: np.ndarray, w1: np.ndarray,
                     h2: np.ndarray, w2: np.ndarray) -> float:
    """Exact weighted Jaccard sum(min w)/sum(max w) of two (hashes, weights)
    multisets (hashes sorted unique)."""
    common, i1, i2 = np.intersect1d(h1, h2, assume_unique=True,
                                    return_indices=True)
    inter = np.minimum(w1[i1], w2[i2]).sum()
    union = w1.sum() + w2.sum() - inter
    return float(inter / union) if union > 0 else 0.0


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


def greedy_containment_distance(common: int, n1: int, n2: int, k: int) -> float:
    """Greedy-path containment variant D = -(1/k)*ln(2c/(1+c)),
    c = common/min(n1,n2) (src/greedy.cpp:1245-1259, 2771-2788)."""
    m = min(n1, n2)
    if m <= 0:
        return 1.0
    return mash_distance(common / m, k)


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
