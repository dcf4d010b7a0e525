"""Learning-to-rank re-ranking (SURVEY.md §2.13).

Mirrors `[U] solr/contrib/ltr/` (LTRScoringQuery + feature store +
LinearModel): a first-pass retrieval produces candidates; per-candidate
FEATURES are extracted (query-dependent ones like the BM25 score,
document ones like length or recency); a model combines them and the
candidates are re-sorted by model score.

Spark-first: features are Catalyst Columns (JVM, codegen) joined onto
the candidate set — only (doc_id, feature...) rows move, the re-rank is
a TakeOrderedAndProject over `candidates` rows (never the corpus).
The LinearModel is the reference's solr `LinearModel.java`; weights
sum left-associatively in insertion order so double results are
reproducible bit-for-bit (the driver oracle relies on this).
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["linear_rerank", "ltr_rerank_bm25"]


def linear_rerank(candidates: DataFrame, features: Dict[str, Column],
                  weights: Dict[str, float], k: int = 10,
                  id_col: str = "doc_id") -> DataFrame:
    """Re-rank ``candidates`` by a linear model over ``features``.

    ``features``: name -> Column evaluated against the candidate rows
    (join any doc-side columns on beforehand). Returns
    (id, ltr_score double, features...) top-k by score desc / id asc.
    """
    out = candidates
    for name, col in features.items():
        out = out.withColumn(name, col.cast("double"))
    score = None
    for name, w in weights.items():
        term = F.lit(float(w)) * F.col(name)
        score = term if score is None else score + term
    return (
        out.withColumn("ltr_score", score)
        .orderBy(F.desc("ltr_score"), F.asc(id_col))
        .limit(k)
    )


def ltr_rerank_bm25(reader, query: str, weights: Dict[str, float],
                    k: int = 10, candidates: int = 50) -> DataFrame:
    """The canonical LTR pipeline: BM25 first pass -> feature extract
    (bm25 score, log doc length, id-recency prior) -> linear re-rank.
    Feature names: bm25, log_dl, recency."""
    cand = reader.search(query, k=candidates)
    cand = cand.join(reader.docmeta.select("doc_id", "dl"), "doc_id")
    feats = {
        "bm25": F.col("score").cast("double"),
        "log_dl": F.log(F.lit(1.0) + F.col("dl")),
        "recency": F.lit(1000.0) / (F.col("doc_id") + F.lit(10.0)),
    }
    return linear_rerank(cand, feats, weights, k=k).select(
        "doc_id", F.round("ltr_score", 4).alias("ltr_score_r"),
        F.round("bm25", 4).alias("bm25_r"),
    )
