"""Lossy 1-byte document-length encoding (Lucene SmallFloat semantics).

Mirrors `[U] lucene/core/src/java/org/apache/lucene/util/SmallFloat.java
:: intToByte4 / byte4ToInt` (4-bit-mantissa floating point into one
byte). BM25 norms are stored with this encoding, so scores are only
Lucene-identical if the lossy round-trip is replicated exactly
(SURVEY.md §4.4.1).

Scheme (re-derived from the public algorithm, not copied code):
values 0..7 are stored verbatim ("subnormal"); larger values keep their
4 most significant bits: the top bit is implicit, the next 3 go into
the low bits of the byte, and (shift+1) goes into the high 5 bits.
Encoding is monotonic, decoding returns the largest representable value
<= the original.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "int_to_byte4",
    "byte4_to_int",
    "LENGTH_TABLE",
    "encode_norms",
]


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int into the 0..255 norm byte."""
    if i < 0:
        raise ValueError("only non-negative values accepted")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # drop the implicit high bit
    encoded |= (shift + 1) << 3
    if encoded > 255:
        raise ValueError(f"value {i} too large for byte4 encoding")
    return encoded


def byte4_to_int(b: int) -> int:
    """Decode a norm byte (0..255) back to its representative length."""
    if not 0 <= b <= 255:
        raise ValueError("norm byte out of range")
    bits = b & 0x07
    shift = (b >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


# Lucene precomputes LENGTH_TABLE[256] once; scorers index it by the
# unsigned norm byte ([U] .../search/similarities/BM25Similarity.java).
LENGTH_TABLE: np.ndarray = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)

# Vectorized encoder: norm bytes are monotone in length, so encoding is
# a searchsorted against the 256 decoded representatives.
_SORTED_REPR = LENGTH_TABLE.copy()
assert bool(np.all(np.diff(_SORTED_REPR) > 0)), "byte4 table must be strictly increasing"


def encode_norms(lengths: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over an int array (doc lengths -> norm bytes)."""
    lengths = np.asarray(lengths, dtype=np.int64)
    if lengths.size and int(lengths.min()) < 0:
        raise ValueError("only non-negative values accepted")
    # largest representative <= length == searchsorted(side='right') - 1
    idx = np.searchsorted(_SORTED_REPR, lengths, side="right") - 1
    return idx.astype(np.uint8)
