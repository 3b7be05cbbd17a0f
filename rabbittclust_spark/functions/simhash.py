"""SimHash 64-bit document fingerprints (Charikar) over char shingles.

The reference's order-sensitive sketch alternative (OrderMinHash, dispatch at
src/SketchInfo.cpp:130-141) motivates a second signature family; the north
rule asks for SimHash explicitly.  Near-dup predicate = Hamming distance <=
``simhash_hamming_max``; candidate generation uses the standard Charikar
block-permutation trick: split 64 bits into (hamming_max+1) blocks — any pair
within distance hamming_max shares at least one exact block (pigeonhole), so
block values are LSH keys.
"""

from __future__ import annotations

import numpy as np

from rabbittclust_spark.functions.hashing import shingle_hashes

_U64 = np.uint64


def simhash64(text: str, k: int, seed: int = 0, lowercase: bool = False) -> int:
    """64-bit SimHash over distinct char k-shingle hashes (unweighted).

    bit_j(sig) = 1 iff sum over shingles of (+1 if bit_j(h) else -1) > 0.
    Empty documents hash to 0.
    """
    h = shingle_hashes(text, k, seed=seed, lowercase=lowercase)
    if len(h) == 0:
        return 0
    # bits[n, 64] in {0,1}; vectorized, chunked to bound memory
    counts = np.zeros(64, dtype=np.int64)
    step = 1 << 16
    shifts = np.arange(64, dtype=_U64)
    for i in range(0, len(h), step):
        chunk = h[i:i + step]
        bits = ((chunk[:, None] >> shifts[None, :]) & _U64(1)).astype(np.int64)
        counts += bits.sum(axis=0) * 2 - len(chunk)  # (+1/-1 tally)
    sig = np.where(counts > 0, 1, 0).astype(np.uint64)
    return int((sig << shifts).sum(dtype=np.uint64))


def simhash_blocks(sig: int, num_blocks: int) -> list[int]:
    """Split a 64-bit simhash into ``num_blocks`` LSH key blocks.

    Key = (block_index << 56) | block_bits so blocks never collide across
    positions.  num_blocks = hamming_max + 1 guarantees recall 1.0 for pairs
    within hamming_max (pigeonhole).  Requires 2 <= num_blocks <= 64: at
    num_blocks >= 2 every block is <= 33 bits wide, so the tag at bit 56
    never overlaps and the key fits a signed int64.
    """
    if not 2 <= num_blocks <= 64:
        raise ValueError(f"num_blocks must be in [2, 64], got {num_blocks}")
    width = 64 // num_blocks
    extra = 64 % num_blocks
    keys = []
    pos = 0
    for i in range(num_blocks):
        w = width + (1 if i < extra else 0)
        block = (sig >> pos) & ((1 << w) - 1)
        keys.append((i << 56) | block)
        pos += w
    return keys


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_block_exprs(col, num_blocks: int):
    """Pure-column-expression twin of :func:`simhash_blocks` — an
    ``array<long>`` of ``(i << 56) | block_i`` shift/mask expressions, fully
    JVM-side (no Python round-trip per row).

    ``shiftrightunsigned`` gives the logical shift, so a signed int64 column
    behaves exactly like the Python path's ``sig & 0xFFFF...`` unsigned view.
    Parity with simhash_blocks is asserted in tests/test_simhash.py.
    """
    from pyspark.sql import functions as F

    if not 2 <= num_blocks <= 64:
        raise ValueError(f"num_blocks must be in [2, 64], got {num_blocks}")
    width = 64 // num_blocks
    extra = 64 % num_blocks
    exprs = []
    pos = 0
    for i in range(num_blocks):
        w = width + (1 if i < extra else 0)
        mask = (1 << w) - 1
        block = F.shiftrightunsigned(col, pos).bitwiseAND(F.lit(mask))
        exprs.append(F.lit(i << 56).bitwiseOR(block))
        pos += w
    return F.array(*exprs)
