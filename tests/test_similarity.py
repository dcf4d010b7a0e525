"""Similarity-search operator tests (ANN over embedding columns)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _np_cosine_topk(rows, qvec, k):
    q = np.asarray(qvec, dtype=np.float64)
    scored = []
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        c = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        scored.append((r["vec_id"], c))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


def test_cosine_topk_matches_numpy(emb):
    qvec = sim.fixed_query_vector(64)
    expect = _np_cosine_topk(emb.collect(), qvec, 10)
    got = [(r["vec_id"], r["cosine"]) for r in sim.cosine_topk(emb, qvec, 10).collect()]
    assert [g[0] for g in got] == [e[0] for e in expect]
    for (gid, gc), (eid, ec) in zip(got, expect):
        assert abs(gc - ec) < 1e-9


def test_cosine_topk_stays_jvm_side(emb):
    """The exact path must not contain any Python UDF eval node."""
    plan = sim.cosine_topk(emb, sim.fixed_query_vector(64), 10)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_knn_join(emb):
    probes = emb.filter(F.col("vec_id") < 3)
    out = sim.cosine_knn_join(emb, probes, k=4).collect()
    by_probe = {}
    for r in out:
        by_probe.setdefault(r["probe_id"], []).append(r)
    assert set(by_probe) == {0, 1, 2}
    rows = emb.collect()
    for pid, got in by_probe.items():
        got.sort(key=lambda r: r["rnk"])
        qvec = next(r["embedding"] for r in rows if r["vec_id"] == pid)
        expect = [t for t in _np_cosine_topk(rows, qvec, 5) if t[0] != pid][:4]
        assert [g["target_id"] for g in got] == [e[0] for e in expect]


def test_lsh_topk_subset_and_exact_scores(emb):
    """LSH results carry EXACT cosines and are drawn from the corpus;
    a planted duplicate of the query must always be recalled at rank 1."""
    qvec = sim.fixed_query_vector(64)
    spark = emb.sparkSession
    planted = emb.unionByName(
        spark.createDataFrame([(99999, [float(x) for x in qvec], 0)],
                              "vec_id long, embedding array<float>, label int")
    )
    got = sim.lsh_bucket_topk(planted, qvec, k=5).collect()
    assert got[0]["vec_id"] == 99999
    assert abs(got[0]["cosine"] - 1.0) < 1e-6
    all_rows = {r["vec_id"]: r["embedding"] for r in planted.collect()}
    for r in got:
        v = np.asarray(all_rows[r["vec_id"]], dtype=np.float64)
        q = np.asarray(qvec)
        expect = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        assert abs(r["cosine"] - expect) < 1e-9


def test_lsh_near_dup_finds_planted(emb):
    spark = emb.sparkSession
    dup = emb.filter(F.col("vec_id") < 8).withColumn("vec_id", F.col("vec_id") + 10000)
    planted = emb.unionByName(dup)
    pairs = {(r["a"], r["b"]) for r in
             sim.embedding_near_dup_pairs(planted, 0.999).collect()}
    assert {(i, i + 10000) for i in range(8)} <= pairs


def test_lsh_near_dup_matches_exact(emb):
    """LSH-bucketed near-dup == exact O(n^2) pairs at high threshold."""
    spark = emb.sparkSession
    dup = emb.filter(F.col("vec_id") < 5).withColumn("vec_id", F.col("vec_id") + 10000)
    planted = emb.unionByName(dup)
    exact = {(r["a"], r["b"]) for r in sim.exact_near_dup_pairs(planted, 0.999).collect()}
    lsh = {(r["a"], r["b"]) for r in sim.embedding_near_dup_pairs(planted, 0.999).collect()}
    assert lsh == exact


def test_fixed_query_vector_unit():
    v = sim.fixed_query_vector(64)
    assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-12


def test_ivf_build_search_exact_on_clustered_data(spark, tmp_path):
    """Materialized IVF with planted well-separated clusters: probing
    the nearest lists recovers the exact brute-force top-k (the
    structured-data regime IVF exists for); on unstructured vectors
    recall is governed by n_probe (driver entry is rows-only for that
    reason). Also pins the scale contract: the probed scan carries a
    partition filter on ``cluster`` (directory pruning, no full read)."""
    import numpy as np

    from lucene_solr_spark.operators import similarity as sim

    rng = np.random.default_rng(5)
    centers = rng.normal(0, 1, (6, 16)) * 8
    rows = []
    for i in range(300):
        c = i % 6
        v = centers[c] + rng.normal(0, 0.2, 16)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    centroids = sim.ivf_build(df, path, n_clusters=6, iters=4)
    assert centroids.shape == (6, 16)
    assert (sim.ivf_centroids(path) == centroids).all()
    q = [float(x) for x in centers[2] + 0.05]
    exact = [(r["vec_id"], round(r["cosine"], 6))
             for r in sim.cosine_topk(df, q, 10).collect()]
    got = sim.ivf_search(spark, path, q, 10, n_probe=2)
    assert [(r["vec_id"], round(r["cosine"], 6)) for r in got.collect()] == exact
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan


def test_ivf_partition_pruning_reads_probed_lists_only(spark, tmp_path):
    """The pruned scan must touch n_probe/n_clusters of the files: the
    partition-filtered plan's input size is a strict subset."""
    import numpy as np

    from lucene_solr_spark.operators import similarity as sim

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    sim.ivf_build(df, path, n_clusters=8, iters=2)
    pruned = spark.read.parquet(path).filter(F.col("cluster").isin([0, 1]))
    n_pruned = pruned.count()
    n_all = spark.read.parquet(path).count()
    assert 0 < n_pruned < n_all
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the filter must sit in PartitionFilters (directory pruning), not
    # as a post-scan data filter
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "cluster" in pf


def test_ivf_build_atomic_completeness_gate(spark, tmp_path):
    """ADVICE r3 #4: _SUCCESS alone must NOT mark an IVF index complete
    — a crash between the data write and the centroids dump leaves
    _SUCCESS present but every search raising on the missing sidecar.
    ivf_complete gates on the sidecar (written last, temp+rename)."""
    import os

    import numpy as np

    from lucene_solr_spark.operators import similarity as sim

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    sim.ivf_build(df, path, n_clusters=4, iters=2)
    assert sim.ivf_complete(path)
    # simulate the crash window: data committed, sidecar missing
    os.remove(os.path.join(path, "_centroids.json"))
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert not sim.ivf_complete(path)
    # rebuild through the same entry point repairs it
    sim.ivf_build(df, path, n_clusters=4, iters=2)
    assert sim.ivf_complete(path)
    assert sim.ivf_search(spark, path, rows[0][1], k=3).count() == 3
    # a session running with dynamic partition-overwrite suppresses the
    # root _SUCCESS marker — completeness must not depend on it (the
    # suite hit this for real when merge_many leaked the conf globally)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        path2 = str(tmp_path / "ivf_dyn")
        sim.ivf_build(df, path2, n_clusters=4, iters=2)
        assert sim.ivf_complete(path2)
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")


def test_pq_index_roundtrip(spark, tmp_path):
    """Product Quantization: the JVM encode (slice + argmin over
    squared-L2 aggregates) is bit-identical to the shared numpy
    kernels, and ADC search ranks exactly like the local replay."""
    import numpy as np

    from lucene_solr_spark.operators import similarity as sim

    rng = np.random.RandomState(3)
    mat = rng.rand(40, 16).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(40)],
        "vec_id long, embedding array<float>")
    d = str(tmp_path / "pq")
    cb = sim.pq_build(df, d, m=4, ksub=4, iters=2)
    assert cb.shape == (4, 4, 4)
    assert sim.pq_complete(d)

    codes_spark = {r["vec_id"]: list(r["codes"])
                   for r in spark.read.parquet(d).collect()}
    codes_local = sim.pq_encode_local(mat.astype(np.float64), cb)
    for i in range(40):
        assert codes_spark[i] == list(codes_local[i]), i

    q = mat[7].astype(np.float64)
    got = [(r["vec_id"], r["adist"])
           for r in sim.pq_search(spark, d, q, k=5).collect()]
    ad = sim.pq_adc_local(q, codes_local, cb)
    expect = sorted(zip(ad, range(40)))[:5]
    assert [g[0] for g in got] == [i for _, i in expect]
    assert np.allclose([g[1] for g in got], [d_ for d_, _ in expect],
                       rtol=0, atol=0)   # bit-identical float64
    # the query's own vector shares the minimal-distance code cells —
    # it must appear in the page (equal quantized distances tie-break
    # by id, so another same-cell vector may rank first)
    assert 7 in [g[0] for g in got]


def test_sq8_index_roundtrip(spark, tmp_path):
    """SQ8: JVM encode (clamped affine + HALF_UP round) bit-identical
    to the shared numpy kernel; approximate-dot ranking matches the
    local replay exactly."""
    import numpy as np

    from lucene_solr_spark.operators import similarity as sim

    rng = np.random.RandomState(11)
    mat = rng.randn(30, 8).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(30)],
        "vec_id long, embedding array<float>")
    d = str(tmp_path / "sq8")
    vmin, vdiff = sim.sq8_build(df, d)
    assert sim.sq8_complete(d)

    codes_spark = {r["vec_id"]: list(r["codes"])
                   for r in spark.read.parquet(d).collect()}
    codes_local = sim.sq8_encode_local(mat.astype(np.float64), vmin, vdiff)
    for i in range(30):
        assert codes_spark[i] == list(codes_local[i]), i

    q = mat[3].astype(np.float64)
    got = [(r["vec_id"], r["adot"])
           for r in sim.sq8_search(spark, d, q, k=5).collect()]
    adot = sim.sq8_score_local(q, codes_local, vmin, vdiff)
    expect = sorted(zip(-adot, range(30)))[:5]
    assert [g[0] for g in got] == [i for _, i in expect]
    assert [g[1] for g in got] == [float(-d_) for d_, _ in expect]
    # 8-bit decode error is tiny relative to the score scale: the true
    # self-match must be on the page
    assert 3 in [g[0] for g in got]
