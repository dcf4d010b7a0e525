"""Result clustering: distributed k-means over embedding vectors
(SURVEY.md §2.13).

The reference's clustering contrib (`[U] solr/contrib/clustering/`,
Carrot2 engines) groups search results by content similarity; the
scale-path analog over an ``array<float>`` embedding column is k-means
(the same shape Spark MLlib uses, re-expressed on the DataFrame API so
it composes with the rest of the engine and stays deterministic):

- fit: the quantizer trains on a DETERMINISTIC bounded sample (the
  ``train_n`` lowest-id vectors, FAISS-style coarse-quantizer
  training) with numpy Lloyd on the driver — init = the k smallest-id
  vectors, no RNG. Bounded driver cost at any corpus size, and the
  fit is bit-reproducible anywhere (the DuckDB oracles replay it);
- assignment: squared-L2 distance to each of the k centroids as pure
  JVM column expressions (zip_with + aggregate, no UDF), argmin with
  index tie-break — ``assign_local`` is the bit-identical numpy
  replica (same left-to-right accumulation order), pinned by test;
- iterate a FIXED number of rounds (deterministic; convergence is a
  property test, not a stop condition).

At 10^12 rows the sample collect is capped at train_n x dim doubles
and only (id, cluster) pairs shuffle in assignment — the corpus
vectors never leave their scan tasks.
"""

from __future__ import annotations

from typing import List

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_assign", "kmeans", "kmeans_fit", "kmeans_fit_local",
           "assign_local"]

#: quantizer-training sample cap: vectors with the train_n smallest ids
DEFAULT_TRAIN_SAMPLE = 65_536


def _dist2(vec_col: str, centroid: List[float]):
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(F.col(vec_col), c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign(df: DataFrame, centroids: np.ndarray,
                  vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """-> (id, cluster): nearest centroid per row (index tie-break),
    all-JVM expressions."""
    dists = F.array(*[_dist2(vec_col, c) for c in centroids])
    cluster = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return df.select(F.col(id_col), F.col(vec_col),
                     cluster.alias("cluster"))


def _dist2_local(mat: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Squared L2 of every row of ``mat`` to centroid ``c`` with the
    SAME left-to-right per-dimension accumulation order as the JVM
    ``_dist2`` aggregate — IEEE double ops in identical order, so the
    two engines produce bit-identical distances (and therefore
    identical argmin assignments)."""
    acc = np.zeros(len(mat), dtype=np.float64)
    for d in range(mat.shape[1]):
        diff = mat[:, d] - c[d]
        acc = acc + diff * diff
    return acc


def assign_local(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """numpy replica of kmeans_assign: -> cluster index per row
    (first-min tie-break, matching array_position)."""
    d = np.stack([_dist2_local(mat, np.asarray(c, dtype=np.float64))
                  for c in centroids], axis=1)
    return d.argmin(axis=1)


def kmeans_fit_local(mat: np.ndarray, k: int = 4, iters: int = 5) -> np.ndarray:
    """Deterministic Lloyd over an in-memory (n, dim) float64 matrix
    ordered by id: init = first k rows, fixed iterations, empty
    clusters keep their previous centroid. This is the ONE fit
    implementation — kmeans_fit feeds it the Spark-collected sample,
    the DuckDB oracle generator feeds it the pyarrow-read table, and
    both get bit-identical centroids."""
    mat = np.asarray(mat, dtype=np.float64)
    centroids = mat[:k].copy()
    for _ in range(iters):
        a = assign_local(mat, centroids)
        for c in range(len(centroids)):
            members = mat[a == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def kmeans_fit(df: DataFrame, k: int = 4, iters: int = 5,
               vec_col: str = "embedding", id_col: str = "vec_id",
               train_n: int = DEFAULT_TRAIN_SAMPLE) -> np.ndarray:
    """Deterministic Lloyd k-means; returns the (k, dim) centroids.

    Trains on the ``train_n`` lowest-id vectors (driver-side numpy —
    the FAISS coarse-quantizer pattern: bounded sample fit, full-corpus
    distributed assignment)."""
    rows = (df.orderBy(id_col).limit(train_n)
            .select(vec_col).collect())
    mat = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    return kmeans_fit_local(mat, k, iters)


def kmeans(df: DataFrame, k: int = 4, iters: int = 5,
           vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Deterministic Lloyd k-means; returns (id, cluster)."""
    centroids = kmeans_fit(df, k, iters, vec_col, id_col)
    return kmeans_assign(df, centroids, vec_col, id_col).select(id_col, "cluster")


def cluster_summary(df: DataFrame, k: int = 4, iters: int = 5,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(cluster, size, min_id) — deterministic cluster digest for the
    driver contract."""
    assigned = kmeans(df, k, iters, vec_col, id_col)
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("size"), F.min(id_col).alias("min_id"))
        .orderBy("cluster")
    )
