"""Norm quantization — exact port of Lucene's ``SmallFloat`` 4-bit-mantissa
integer codec used for doc-length norms.

Reference parity: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java
(methods ``intToByte4`` ≈L100, ``byte4ToInt`` ≈L120, ``longToInt4``/
``int4ToLong``).  BM25Similarity#computeNorm stores
``intToByte4(field_len)`` as the per-doc norm; the scorer decodes doc length
through a 256-entry LENGTH_TABLE (BM25Similarity.java ≈L40).

Encoding: values 0..23 are exact ("free" values); larger values are encoded
with a 3-bit mantissa + implicit leading bit and a 5-bit shift, i.e. exact up
to 40, then bucketed (41 -> 40, etc.).
"""

from __future__ import annotations

import numpy as np


def _long_to_int4(i: np.ndarray) -> np.ndarray:
    """Vectorized port of SmallFloat.longToInt4 (values >= 0)."""
    i = np.asarray(i, dtype=np.int64)
    # numBits = 64 - numberOfLeadingZeros(i); for i==0 -> 0
    num_bits = np.zeros_like(i)
    nz = i > 0
    num_bits[nz] = np.floor(np.log2(i[nz].astype(np.float64))).astype(np.int64) + 1
    # float log2 is exact for int64 < 2^53; doc lengths are far below that.
    subnormal = num_bits < 4
    shift = np.where(subnormal, 0, num_bits - 4)
    encoded = (i >> shift) & 0x07
    encoded = encoded | ((shift + 1) << 3)
    return np.where(subnormal, i, encoded).astype(np.int64)


def _int4_to_long(i: np.ndarray) -> np.ndarray:
    """Vectorized port of SmallFloat.int4ToLong."""
    i = np.asarray(i, dtype=np.int64)
    bits = i & 0x07
    shift = (i >> 3) - 1
    subnormal = shift == -1
    decoded = np.where(subnormal, bits, (bits | 0x08) << np.maximum(shift, 0))
    return decoded.astype(np.int64)


MAX_INT4 = int(_long_to_int4(np.array([2**31 - 1]))[0])  # == 231
NUM_FREE_VALUES = 255 - MAX_INT4  # == 24


def int_to_byte4(i) -> np.ndarray:
    """SmallFloat.intToByte4, vectorized. Returns unsigned byte values 0..255."""
    i = np.asarray(i, dtype=np.int64)
    if (i < 0).any():
        raise ValueError("int_to_byte4 requires non-negative values")
    small = i < NUM_FREE_VALUES
    enc = NUM_FREE_VALUES + _long_to_int4(np.maximum(i - NUM_FREE_VALUES, 0))
    return np.where(small, i, enc).astype(np.int64)


def byte4_to_int(b) -> np.ndarray:
    """SmallFloat.byte4ToInt, vectorized. b is unsigned 0..255."""
    b = np.asarray(b, dtype=np.int64)
    small = b < NUM_FREE_VALUES
    dec = NUM_FREE_VALUES + _int4_to_long(np.maximum(b - NUM_FREE_VALUES, 0))
    return np.where(small, b, dec).astype(np.int64)


# BM25Similarity's LENGTH_TABLE: decoded doc length per possible norm byte
# (ref: BM25Similarity.java ≈L40 `LENGTH_TABLE[i] = SmallFloat.byte4ToInt(i)`).
LENGTH_TABLE = byte4_to_int(np.arange(256))


def quantized_length(field_len) -> np.ndarray:
    """True field length -> norm byte -> decoded (lossy) length, as BM25 sees it."""
    return LENGTH_TABLE[int_to_byte4(field_len)]
