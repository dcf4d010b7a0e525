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
