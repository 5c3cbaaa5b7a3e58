"""Lucene SmallFloat 4-bit-mantissa byte encoding for norms (exact port).

Reference semantics: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:100-175
(`longToInt4` / `int4ToLong` / `intToByte4` / `byte4ToInt`).

The norm byte for BM25 is ``intToByte4(numTerms)`` where numTerms is the
per-(doc, field) token count (BM25Similarity.java:115-126). Values 0..23 are
encoded exactly; larger values keep 4 significant bits, so document lengths
are quantized (the "knee" the fixture corpus crosses).

All functions have scalar and vectorized (numpy) forms; the vectorized forms
are what the build pipeline uses per Arrow batch.
"""

from __future__ import annotations

import numpy as np

# 255 - longToInt4(Integer.MAX_VALUE) == 255 - 231 == 24 low values encoded exactly.
NUM_FREE_VALUES = 24

# powers[k] == 2**k for k in 0..62; searchsorted(right) gives Java's
# 64 - Long.numberOfLeadingZeros(i) ("bit length") vectorized and exactly.
_POW2 = np.array([1 << k for k in range(63)], dtype=np.int64)


def long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int to an unsigned byte 0..255."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode an unsigned byte 0..255 produced by int_to_byte4."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + int4_to_long(b - NUM_FREE_VALUES)


def int_to_byte4_array(arr: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over an int64 array of non-negative values."""
    arr = np.asarray(arr, dtype=np.int64)
    if arr.size and arr.min() < 0:
        raise ValueError("Only supports positive values")
    j = arr - NUM_FREE_VALUES
    jc = np.maximum(j, 0)
    num_bits = np.searchsorted(_POW2, jc, side="right").astype(np.int64)
    shift = num_bits - 4
    subnormal = num_bits < 4
    enc_normal = ((jc >> np.maximum(shift, 0)) & 0x07) | ((shift + 1) << 3)
    enc = np.where(subnormal, jc, enc_normal)
    out = np.where(arr < NUM_FREE_VALUES, arr, NUM_FREE_VALUES + enc)
    return out.astype(np.uint8)


# LENGTH_TABLE[i] = byte4ToInt((byte) i) as float32 — BM25Similarity.java:106-112.
LENGTH_TABLE = np.array([byte4_to_int(i) for i in range(256)], dtype=np.float32)
