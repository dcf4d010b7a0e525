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

__all__ = ["linear_rerank", "ltr_rerank_bm25", "tree_node_column",
           "trees_rerank", "ltr_trees_rerank_bm25"]


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


def tree_node_column(node: Dict) -> Column:
    """One regression-tree node -> a Catalyst Column
    (`[U] solr/contrib/ltr/.../model/MultipleAdditiveTreesModel.java ::
    RegressionTreeNode.score`): a leaf is its ``value``; a branch tests
    ``feature < threshold`` and descends left, else right. The whole
    tree compiles to nested CASE WHEN expressions — JVM whole-stage
    codegen, no Python in the scoring path, and the same dict compiles
    the DuckDB oracle SQL (shared-generator lockstep)."""
    if "value" in node:
        return F.lit(float(node["value"]))
    return F.when(
        F.col(node["feature"]) < F.lit(float(node["threshold"])),
        tree_node_column(node["left"]),
    ).otherwise(tree_node_column(node["right"]))


def tree_node_sql(node: Dict) -> str:
    """The SAME node rendered as DuckDB SQL — generated from the one
    model dict so engine and oracle cannot drift."""
    if "value" in node:
        return repr(float(node["value"]))
    return (f"CASE WHEN {node['feature']} < {float(node['threshold'])!r} "
            f"THEN {tree_node_sql(node['left'])} "
            f"ELSE {tree_node_sql(node['right'])} END")


def trees_rerank(candidates: DataFrame, features: Dict[str, Column],
                 trees, k: int = 10, id_col: str = "doc_id") -> DataFrame:
    """MultipleAdditiveTreesModel re-rank: score = sum over trees of
    weight * tree(features), accumulated left-associatively in model
    order (double), ties by id. Same scale shape as linear_rerank —
    features join onto the bounded candidate set, the ensemble is one
    codegen'd expression, TakeOrderedAndProject finishes."""
    out = candidates
    for name, col in features.items():
        out = out.withColumn(name, col.cast("double"))
    score = None
    for t in trees:
        term = F.lit(float(t["weight"])) * tree_node_column(t["root"])
        score = term if score is None else score + term
    return (
        out.withColumn("ltr_score", score)
        .orderBy(F.desc("ltr_score"), F.asc(id_col))
        .limit(k)
    )


def ltr_trees_rerank_bm25(reader, query: str, trees, k: int = 10,
                          candidates: int = 50) -> DataFrame:
    """Tree-ensemble LTR pipeline over the same feature set as
    ltr_rerank_bm25 (bm25, log_dl, recency)."""
    cand = reader.search(query, k=candidates)
    cand = cand.join(reader.docmeta.select("doc_id", "dl"), "doc_id")
    feats = {
        "bm25": F.col("score").cast("double"),
        "log_dl": F.log(F.lit(1.0) + F.col("dl")),
        "recency": F.lit(1000.0) / (F.col("doc_id") + F.lit(10.0)),
    }
    return trees_rerank(cand, feats, trees, k=k).select(
        "doc_id", F.round("ltr_score", 4).alias("ltr_score_r"),
        F.round("bm25", 4).alias("bm25_r"),
    )


def rerank_query(reader, main_query, rr_query, k: int = 10,
                 rerank_docs: int = 50, rerank_weight: float = 2.0) -> DataFrame:
    """Solr {!rerank} (`[U] solr/core/src/java/org/apache/solr/search/
    ReRankQParserPlugin.java` + ReRankCollector): take the main query's
    top ``rerank_docs`` window, rescore each window doc as
    ``mainScore + reRankWeight * rerankScore`` (float32, Lucene's
    QueryRescorer combine; docs not matching the rerank query keep the
    main score), and return the top-k of the window by the new score.

    Scale shape: the window is bounded by ``rerank_docs`` (a request
    parameter — the same driver-side footprint as a top-k result), so
    the rerank query is scored distributed but immediately filtered to
    the window ids before any merge; the final combine runs on
    ``rerank_docs`` rows.
    """
    window = reader.search(main_query, k=rerank_docs).collect()
    ids = [int(r["doc_id"]) for r in window]
    spark = reader.spark
    wdf = spark.createDataFrame(
        [(int(r["doc_id"]), float(r["score"])) for r in window],
        "doc_id long, score float")
    rr = (reader.score_all(rr_query)
          .filter(F.col("doc_id").isin(ids))
          .withColumnRenamed("score", "rr"))
    combined = wdf.join(rr, "doc_id", "left").select(
        "doc_id",
        (F.col("score")
         + (F.lit(float(rerank_weight)).cast("float")
            * F.coalesce(F.col("rr"), F.lit(0.0).cast("float"))
            ).cast("float")).cast("float").alias("score"),
    )
    return combined.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
