"""Deterministic k-means clustering (SURVEY.md §2.13 clustering role)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.clustering import cluster_summary, kmeans


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_kmeans_deterministic(spark, emb):
    a = sorted(map(tuple, kmeans(emb, k=3, iters=3).collect()))
    b = sorted(map(tuple, kmeans(emb.repartition(7), k=3, iters=3).collect()))
    assert a == b  # partitioning-independent


def test_kmeans_separates_planted_clusters(spark):
    rng = np.random.default_rng(11)
    centers = np.eye(3) * 10.0
    rows = []
    for i in range(120):
        c = i % 3
        v = centers[c] + rng.normal(0, 0.1, 3)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans(df, k=3, iters=4).collect()
    by_true = {}
    for r in out:
        by_true.setdefault(r["vec_id"] % 3, set()).add(r["cluster"])
    # each planted cluster maps to exactly one k-means cluster
    assert all(len(v) == 1 for v in by_true.values())
    assert len({next(iter(v)) for v in by_true.values()}) == 3


def test_cluster_summary_shape(spark, emb):
    rows = cluster_summary(emb, k=4, iters=2).collect()
    assert len(rows) <= 4
    assert sum(r["size"] for r in rows) == emb.count()


def test_assign_local_bit_identical_to_jvm_assignment(spark):
    """The oracle generator replays cluster/bucket membership with
    assign_local — it must match the JVM kmeans_assign bit-for-bit
    (same left-to-right accumulation order over dims) on the real
    embeddings tables."""
    import numpy as np
    import pyarrow.parquet as pq

    from lucene_solr_spark.operators.clustering import (
        assign_local, kmeans_fit, kmeans_fit_local, kmeans_assign)

    for sf in ["sf0.001", "sf0.01"]:
        path = f"/root/testdata/{sf}/embeddings.parquet"
        df = spark.read.parquet(path)
        t = pq.read_table(path, columns=["vec_id", "embedding"])
        ids = t["vec_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)[order]
        # fit paths agree bit-for-bit (Spark-collected sample == pyarrow)
        cents_spark = kmeans_fit(df, k=8, iters=3)
        cents_local = kmeans_fit_local(mat, 8, 3)
        assert (cents_spark == cents_local).all()
        jvm = {r["vec_id"]: r["cluster"]
               for r in kmeans_assign(df, cents_spark).collect()}
        local = dict(zip(ids[order].tolist(),
                         assign_local(mat, cents_local).tolist()))
        assert jvm == local
