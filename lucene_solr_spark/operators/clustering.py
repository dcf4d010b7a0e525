"""Result clustering: distributed k-means over embedding vectors
(SURVEY.md §2.13).

The reference's clustering contrib (`[U] solr/contrib/clustering/`,
Carrot2 engines) groups search results by content similarity; the
scale-path analog over an ``array<float>`` embedding column is k-means
(the same shape Spark MLlib uses, re-expressed on the DataFrame API so
it composes with the rest of the engine and stays deterministic):

- init: centroids = the k vectors with the smallest ids (deterministic,
  no RNG — reproducible across partitionings and resumable);
- assignment: squared-L2 distance to each of the k centroids as pure
  JVM column expressions (zip_with + aggregate, no UDF), argmin with
  index tie-break;
- update: mean vector per cluster via posexplode + groupBy(cluster,
  dim) — a (k x dim)-sized aggregate, collected to the driver (tiny);
  iterate a FIXED number of rounds (deterministic; convergence is a
  property test, not a stop condition).

At 10^12 rows only (id, cluster) pairs and k x dim aggregates shuffle —
the vectors themselves never leave their scan tasks.
"""

from __future__ import annotations

from typing import List

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_assign", "kmeans"]


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


def kmeans_fit(df: DataFrame, k: int = 4, iters: int = 5,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> np.ndarray:
    """Deterministic Lloyd k-means; returns the (k, dim) centroids."""
    init = (df.orderBy(id_col).limit(k)
            .select(id_col, vec_col).collect())
    centroids = np.array([list(r[vec_col]) for r in init], dtype=np.float64)
    for _ in range(iters):
        assigned = kmeans_assign(df, centroids, vec_col, id_col)
        rows = (
            assigned.select("cluster", F.posexplode(vec_col).alias("dim", "v"))
            .groupBy("cluster", "dim").agg(F.avg("v").alias("m"))
            .collect()
        )
        nxt = centroids.copy()
        for r in rows:
            nxt[r["cluster"], r["dim"]] = r["m"]
        centroids = nxt
    return centroids


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
