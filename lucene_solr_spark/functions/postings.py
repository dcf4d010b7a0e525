"""Flat posting-row codec (index format v3).

One parquet row per (term, seg, shard) holds the WHOLE posting list as
four binary blobs plus parallel per-block metadata arrays:

    docs binary   -- varint doc-id deltas; value at each 128-block start
                     is the ABSOLUTE doc id (block-local decode possible)
    tfs  binary   -- varint term frequencies
    pos  binary   -- varint position deltas; value at each posting
                     (doc) start is the absolute first position
    norms binary  -- uint8 norm byte per posting
    blk_first/blk_last/blk_n/blk_max_tf/blk_min_norm -- per-block stats
                     (the skip-list impacts, `[U] lucene/core/.../codecs/
                     lucene84/Lucene84SkipWriter.java`, `Impacts.java`)
    blk_doc_off/blk_tf_off/blk_pos_off -- byte offsets of each block
                     inside the blobs (the skip pointers)

vs. the v2 nested ``blocks array<struct<...>>``: flat blobs encode in
ONE vectorized varint pass per segment (no per-block numpy-call
overhead) and ship through Arrow as plain byte arrays instead of a
million tiny structs. Query-side block skipping slices the blob at
``blk_*_off`` — same random access as v2, far cheaper to produce.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .varint import decode_varint, encode_varint_with_lengths

BLOCK_SIZE = 128

FLAT_BLOCK_COLS = [
    "blk_first", "blk_last", "blk_n", "blk_max_tf", "blk_min_norm",
    "blk_doc_off", "blk_tf_off", "blk_pos_off",
]
FLAT_BLOB_COLS = ["docs", "tfs", "pos", "norms"]


# ----------------------------------------------------------------- encode


def encode_posting_list(docs: np.ndarray, tfs: np.ndarray, norms: np.ndarray,
                        pos_deltas: np.ndarray, pos_bounds: np.ndarray) -> Dict[str, object]:
    """Encode ONE term's (shard's) posting list -> flat column dict.

    ``pos_deltas``: concatenated per-doc position deltas (absolute at
    each doc start); ``pos_bounds[i]`` = cumulative position count after
    posting i. Used by the merge path; the build kernel encodes whole
    segments at once and slices instead (see build.make_unified_kernel).
    """
    n = len(docs)
    block_starts = np.arange(0, n, BLOCK_SIZE, dtype=np.int64)
    block_ends = np.minimum(block_starts + BLOCK_SIZE, n)

    ddel = np.empty(n, dtype=np.int64)
    ddel[0] = docs[0]
    np.subtract(docs[1:], docs[:-1], out=ddel[1:])
    ddel[block_starts] = docs[block_starts]

    docs_buf, dlen = encode_varint_with_lengths(ddel)
    tfs_buf, tlen = encode_varint_with_lengths(tfs)
    pos_buf, plen = encode_varint_with_lengths(pos_deltas)
    dboff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(dlen, out=dboff[1:])
    tboff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tlen, out=tboff[1:])
    pboff = np.zeros(len(pos_deltas) + 1, dtype=np.int64)
    if len(pos_deltas):
        np.cumsum(plen, out=pboff[1:])
    pos_excl = np.zeros(n, dtype=np.int64)
    pos_excl[1:] = pos_bounds[:-1]

    return {
        "blk_first": docs[block_starts].tolist(),
        "blk_last": docs[block_ends - 1].tolist(),
        "blk_n": (block_ends - block_starts).astype(np.int32).tolist(),
        "blk_max_tf": np.maximum.reduceat(tfs, block_starts).astype(np.int32).tolist(),
        "blk_min_norm": np.minimum.reduceat(norms, block_starts).astype(np.int32).tolist(),
        "blk_doc_off": dboff[block_starts].astype(np.int32).tolist(),
        "blk_tf_off": tboff[block_starts].astype(np.int32).tolist(),
        "blk_pos_off": pboff[pos_excl[block_starts]].astype(np.int32).tolist(),
        "docs": docs_buf,
        "tfs": tfs_buf,
        "pos": pos_buf,
        "norms": norms.astype(np.uint8).tobytes(),
    }


# ----------------------------------------------------------------- decode


def _as_int_array(v) -> np.ndarray:
    return np.asarray(v, dtype=np.int64)


def decode_docs(row) -> np.ndarray:
    """Whole-list doc ids: segmented cumsum with absolute resets at
    block starts."""
    d = decode_varint(row["docs"])
    if d.size == 0:
        return d
    blk_n = _as_int_array(row["blk_n"])
    starts = np.zeros(len(blk_n), dtype=np.int64)
    starts[1:] = np.cumsum(blk_n)[:-1]
    c = np.cumsum(d)
    corr = np.zeros(len(blk_n), dtype=np.int64)
    corr[1:] = c[starts[1:] - 1]
    return c - np.repeat(corr, blk_n)


def decode_tfs(row) -> np.ndarray:
    return decode_varint(row["tfs"])


def decode_norms(row) -> np.ndarray:
    return np.frombuffer(row["norms"], dtype=np.uint8)


def decode_positions_concat(row, tfs: np.ndarray) -> np.ndarray:
    """-> absolute positions, concatenated per posting (segmented cumsum
    with absolute resets at posting starts)."""
    deltas = decode_varint(row["pos"])
    if deltas.size == 0:
        return deltas
    starts = np.zeros(len(tfs), dtype=np.int64)
    starts[1:] = np.cumsum(tfs)[:-1]
    c = np.cumsum(deltas)
    corr = np.zeros(len(tfs), dtype=np.int64)
    corr[1:] = c[starts[1:] - 1]
    return c - np.repeat(corr, tfs)


def split_positions(pos_concat: np.ndarray, tfs: np.ndarray) -> List[np.ndarray]:
    bounds = np.cumsum(tfs)
    starts = np.zeros(len(tfs), dtype=np.int64)
    starts[1:] = bounds[:-1]
    return [pos_concat[s:e] for s, e in zip(starts, bounds)]


def decode_block_docs(row, i: int) -> np.ndarray:
    """Decode ONLY block i's doc ids (for WAND block skipping)."""
    off = _as_int_array(row["blk_doc_off"])
    end = off[i + 1] if i + 1 < len(off) else len(row["docs"])
    d = decode_varint(row["docs"][off[i]:end])
    return np.cumsum(d)  # first value is absolute by construction
