"""ClassicSimilarity (TF-IDF) scoring kernel, Lucene-8 float path.

Mirrors `[U] lucene/core/src/java/org/apache/lucene/search/similarities/
TFIDFSimilarity.java` + `ClassicSimilarity.java`:

- ``idf = (float)(ln((docCount + 1) / (df + 1)) + 1)`` — computed in
  float64, cast to float32 BEFORE the boost multiply
  (``TFIDFSimilarity.idf()`` returns float).
- ``queryWeight = boost * idf`` as a float32 product
  (``TFIDFScorer`` ctor).
- ``tf = (float) sqrt(freq)`` (``ClassicSimilarity.tf``).
- length norm decoded through the SAME SmallFloat byte4 table as BM25
  (Lucene 8 stores the field length; ``computeNorm`` is shared):
  ``normTable[i] = (float)(1 / sqrt(LENGTH_TABLE[i]))`` for i >= 1.
  Index 0 (length 0) is unreachable for any doc that matched a term —
  pinned to 0 here rather than Lucene's backwards-compat filler.
- ``score = (tf * queryWeight) * normTable[norm]`` evaluated in
  float32 in Java's left-associative order.
- a multi-term (phrase) weight sums the per-term float32 idfs in
  float64 and casts once (``TFIDFSimilarity.idfExplain`` accumulates
  in double).

Same contract as functions/bm25.py: numpy-vectorized, shared verbatim
by the Spark scorer kernel and the DuckDB SQL oracle generator, so
engine-vs-oracle checks exercise the distributed machinery against an
independent evaluation of the identical float path.
"""

from __future__ import annotations

import math

import numpy as np

from .smallfloat import LENGTH_TABLE

__all__ = ["classic_idf", "classic_term_weight", "classic_norm_table",
           "classic_score_tf", "classic_phrase_weight"]


def classic_idf(df: int, doc_count: int) -> np.float32:
    """TFIDFSimilarity.idf — float32 result of a float64 log."""
    return np.float32(math.log((doc_count + 1) / (df + 1)) + 1.0)


def classic_term_weight(df: int, doc_count: int,
                        boost: float = 1.0) -> np.float32:
    """TFIDFScorer queryWeight = boost * idf, float32 multiply."""
    return np.float32(np.float32(boost) * classic_idf(df, doc_count))


def classic_phrase_weight(dfs, doc_count: int,
                          boost: float = 1.0) -> np.float32:
    """idfExplain for multi-term: per-term float32 idfs summed in
    float64, then boost * sum as the float32 queryWeight."""
    total = 0.0
    for df in dfs:
        total += float(classic_idf(df, doc_count))
    return np.float32(np.float32(boost) * np.float32(total))


def classic_norm_table() -> np.ndarray:
    """256-entry float32 ``1/sqrt(decoded length)`` cache (length-
    independent of collection stats, unlike BM25's avgdl cache)."""
    tbl = np.zeros(256, dtype=np.float32)
    lengths = LENGTH_TABLE.astype(np.float64)
    nz = lengths > 0
    tbl[nz] = (1.0 / np.sqrt(lengths[nz])).astype(np.float32)
    return tbl


def classic_score_tf(
    weight: np.float32, tfs: np.ndarray, norm_bytes: np.ndarray,
    cache: np.ndarray,
) -> np.ndarray:
    """Vectorized float32 TF-IDF: (sqrt(tf) * weight) * norm."""
    tf32 = np.sqrt(np.asarray(tfs, dtype=np.float64)).astype(np.float32)
    nrm = cache[np.asarray(norm_bytes, dtype=np.uint8)]
    return (tf32 * np.float32(weight)) * nrm
