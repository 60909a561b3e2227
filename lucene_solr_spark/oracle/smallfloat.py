"""SmallFloat: Lucene's lossy byte encoding of field lengths (norms).

Semantics parity with the reference (cited for checking, not copied):
- ``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-122``
  (longToInt4), ``:125-137`` (int4ToLong), ``:147-156`` (intToByte4),
  ``:159-167`` (byte4ToInt).

Encoding recap: a positive int is mapped to one unsigned byte.  Values
below ``NUM_FREE_VALUES`` (= 255 - longToInt4(2^31-1) = 24) are stored
exactly; larger values keep 4 significant bits (1 implicit) plus a
shift, i.e. a tiny custom float.  The decode table has 256 entries and
is monotone, which BM25 exploits via a per-query 256-entry cache
(``BM25Similarity.java:211-214``).

Both scalar and numpy-vectorized forms are provided; the vectorized
forms are used inside Arrow UDF kernels on the Spark side, the scalar
forms by the oracle.  They are bit-for-bit identical by construction
(pytest property test covers the full 0..2^31-1 boundary sweep).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "long_to_int4",
    "int4_to_long",
    "int_to_byte4",
    "byte4_to_int",
    "int_to_byte4_np",
    "byte4_to_int_np",
    "LENGTH_TABLE",
    "NUM_FREE_VALUES",
]


def long_to_int4(i: int) -> int:
    """Order-preserving 4-significant-bit encoding of a non-negative long."""
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


_MAX_INT4 = long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - _MAX_INT4  # == 24


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int to an unsigned byte (0..255)."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode an unsigned byte (0..255) back to the representative int."""
    i = b & 0xFF
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + int4_to_long(i - NUM_FREE_VALUES)


#: decode table, index = unsigned norm byte — mirrors BM25Similarity's
#: LENGTH_TABLE (``BM25Similarity.java:129-135``) but kept in int64 here;
#: the float32 view lives in oracle.bm25.
LENGTH_TABLE = np.array([byte4_to_int(i) for i in range(256)], dtype=np.int64)

# Encode lookup: int_to_byte4 is monotone non-decreasing, so encoding is a
# searchsorted against the decode table: the encoded byte of v is the last
# index whose decoded value is <= v.
_ENC_BOUNDARIES = LENGTH_TABLE  # strictly increasing


def int_to_byte4_np(values: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over a non-negative int array → uint8."""
    v = np.asarray(values, dtype=np.int64)
    if v.size and v.min() < 0:
        raise ValueError("Only supports positive values")
    idx = np.searchsorted(_ENC_BOUNDARIES, v, side="right") - 1
    return idx.astype(np.uint8)


def byte4_to_int_np(b: np.ndarray) -> np.ndarray:
    """Vectorized byte4_to_int over a uint8 array → int64."""
    return LENGTH_TABLE[np.asarray(b, dtype=np.uint8)]
