"""Deterministic, vectorized 64-bit hashing of character shingles.

The reference hashes DNA k-mers with a 2-bit rolling encode + canonical
min(fwd, revcomp) (reference: src/SketchInfo.cpp:284-293,355-393).  Web text
has no reverse complement, so the analog is a polynomial rolling hash over the
UTF-8 bytes of each k-character window, whitened with a splitmix64 finalizer.
All arithmetic is mod 2**64 (numpy uint64 wraparound), hence bit-exact across
platforms — the determinism discipline the reference gets from its fixed
shuffle seeds 23/348842630 (src/SketchInfo.cpp:88-94).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)

# FNV-1a 64-bit prime as the polynomial base; odd => invertible mod 2^64.
_BASE = 1099511628211
_BASE_INV = pow(_BASE, -1, 1 << 64)

# splitmix64 constants (public domain, Steele et al.)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer; input/output uint64 arrays."""
    z = (x + _SM_GAMMA).astype(_U64)
    z = (z ^ (z >> np.uint64(30))) * _SM_M1
    z = (z ^ (z >> np.uint64(27))) * _SM_M2
    return z ^ (z >> np.uint64(31))


def hash64_scalar(x: int, seed: int = 0) -> int:
    """Scalar convenience wrapper (tests / tiny driver-side use)."""
    arr = np.array([(x + seed) & 0xFFFFFFFFFFFFFFFF], dtype=_U64)
    return int(splitmix64(arr)[0])


def rolling_window_hashes(data: bytes, k: int, seed: int = 0) -> np.ndarray:
    """All k-byte-window polynomial hashes of ``data``, whitened, as uint64.

    Returns an array of length max(0, len(data) - k + 1).  Fully vectorized:
    with S[i] = sum_{j<i} b[j]*B^{-j} (cumsum of b * Binv^j), the window hash
    h(i) = (S[i+k] - S[i]) * B^{i+k-1}, which equals the standard polynomial
    hash sum b[i+t]*B^{k-1-t} mod 2^64.
    """
    n = len(data)
    m = n - k + 1
    if m <= 0:
        return np.empty(0, dtype=_U64)
    b = np.frombuffer(data, dtype=np.uint8).astype(_U64)
    # powers of B and B^-1 mod 2^64 (cumprod wraps in C, exact)
    binv_pows = np.empty(n, dtype=_U64)
    binv_pows[0] = _U64(1)
    if n > 1:
        np.cumprod(np.full(n - 1, _BASE_INV & 0xFFFFFFFFFFFFFFFF, dtype=_U64),
                   out=binv_pows[1:])
    b_pows = np.empty(n, dtype=_U64)
    b_pows[0] = _U64(1)
    if n > 1:
        np.cumprod(np.full(n - 1, _BASE, dtype=_U64), out=b_pows[1:])

    s = np.zeros(n + 1, dtype=_U64)
    np.cumsum(b * binv_pows, out=s[1:])
    h = (s[k:] - s[:m]) * b_pows[k - 1:]
    if seed:
        h = h + _U64(seed & 0xFFFFFFFFFFFFFFFF)
    return splitmix64(h)


def shingle_hashes(text: str, k: int, seed: int = 0, lowercase: bool = False) -> np.ndarray:
    """Distinct (sorted, unique) k-character-shingle hashes of a document.

    Analog of the reference's per-document k-mer hash-set + sort
    (src/SketchInfo.cpp:1153-1193: hash-set dedup then sort).
    """
    if lowercase:
        text = text.lower()
    h = rolling_window_hashes(text.encode("utf-8"), k, seed=seed)
    return np.unique(h)  # sorted + distinct
