"""End-to-end: distributed build + query == exhaustive oracle (SURVEY.md §5.2).

The key pattern from the reference's own test strategy: distributed run
must equal a single-process oracle
(`[U] solr/core/src/test/.../BaseDistributedSearchTestCase.java ::
compareResponses`). Rank-identity is asserted on doc_ids AND float32
scores at k in {1, 10, 100} (BASELINE.json north_rule).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.build import build_index, read_manifest
from lucene_solr_spark.operators.search import IndexReader
from lucene_solr_spark.sources import load_source_table
from tests.oracle import OracleIndex

QUERIES = [
    # term (incl. hot, medium, df=1-ish, absent, mixed case)
    "spark", "vector", "the", "content:customer", "zzzabsent", "SPARK",
    # bool_or 2-5 clauses
    "spark OR merge", "content:(hash OR scan OR vector)",
    "batch OR stream OR window OR key OR dup", "spark OR zzzabsent",
    # bool_and
    "spark AND merge", "join AND window AND key", "spark AND zzzabsent",
    # bool_mixed
    "spark AND NOT merge", "batch OR stream NOT join", "NOT spark",
    "(hash OR scan) AND NOT (merge OR join)",
    # phrase
    '"batch batch"', '"merge line"', '"sort table scan"', '"spark zzzabsent"',
]


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_source_table(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx"))
    build_index(spark, corpus, d, docs_per_seg=128)
    return IndexReader(spark, d)


@pytest.fixture(scope="module")
def oracle(corpus):
    docs = [(r["doc_id"], r["content"]) for r in corpus.select("doc_id", "content").collect()]
    return OracleIndex(sorted(docs))


def test_manifest_metrics(index, corpus):
    m = index.manifest
    n = corpus.count()
    assert m.doc_count == n
    assert len(m.segments) == -(-n // 128)
    for s in m.segments:
        assert s["n_docs"] > 0 and s["n_terms"] > 0 and s["n_postings"] > 0
        assert len(s["input_fingerprint"]) == 16


@pytest.mark.parametrize("k", [1, 10, 100])
def test_rank_identity_vs_oracle(index, oracle, k):
    for qtext in QUERIES:
        expected = oracle.search(qtext, k=k)
        got_docs, got_total = index.search_with_total(qtext, k=k)
        exp = [(d, np.float32(s)) for d, s in expected.score_docs]
        got = [(d, np.float32(s)) for d, s in got_docs]
        assert got == exp, (
            f"query={qtext!r} k={k}\n engine={got[:5]}...\n oracle={exp[:5]}..."
        )
        assert got_total == expected.total_hits, f"total_hits mismatch for {qtext!r}"


def test_pruned_equals_exhaustive(index, oracle):
    for qtext in ["spark", "the", "spark OR merge OR vector",
                  "batch OR stream OR window OR key OR dup", "a OR the OR spark"]:
        for k in (1, 3, 10, 50):
            pruned, t1 = index.search_with_total(qtext, k=k, prune="maxscore")
            naive, t2 = index.search_with_total(qtext, k=k, prune="none")
            assert [(d, np.float32(s)) for d, s in pruned] == \
                   [(d, np.float32(s)) for d, s in naive], f"{qtext!r} k={k}"
            assert t1 == t2


def test_sha256_invariant(index, corpus):
    """Per-row content sha256 equality engine vs source (BASELINE.json:L15)."""
    src = corpus.select("doc_id", F.sha2("content", 256).alias("expected"))
    joined = index.docmeta.join(src, "doc_id")
    n_total = joined.count()
    n_match = joined.filter(F.col("sha256") == F.col("expected")).count()
    assert n_total == corpus.count()
    assert n_match == n_total


def test_docmeta_norms_match_oracle(index, oracle):
    rows = index.docmeta.select("doc_id", "dl", "norm_byte").collect()
    assert len(rows) == len(oracle.doc_ids)
    for r in rows:
        assert r["norm_byte"] == oracle.norm_bytes[r["doc_id"]], r


def test_fetch_stored_fields(index):
    top = index.search("spark", k=5)
    fetched = index.fetch(top).collect()
    assert len(fetched) == 5
    for r in fetched:
        assert r["repo"] and r["path"] and r["commit"]
        assert r["sha256"] is not None


def test_fastpath_equals_shuffle_path(spark, tmp_path):
    """The no-shuffle scan fast path (segment files below
    maxPartitionBytes) must return exactly what the repartition path
    returns."""
    from lucene_solr_spark.sources import load_source_table

    corpus = load_source_table(spark, "/root/testdata/sf0.001")
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, docs_per_seg=64)
    idx = IndexReader(spark, d)
    assert idx._segments_unsplittable()
    queries = ["spark", "spark OR merge OR vector", "hash AND join",
               '"batch batch"', "spar*", "(hash OR scan) AND NOT merge"]
    fast = {q: idx.search_with_total(q, k=20) for q in queries}
    # disable the fast path by pretending the file listing failed
    idx2 = IndexReader(spark, d)
    idx2._seg_files_cache = {}
    assert not idx2._segments_unsplittable()
    for q in queries:
        assert idx2.search_with_total(q, k=20) == fast[q], q


def test_fastpath_guard_respects_real_split_size(spark, tmp_path):
    """ADVICE r1 (high): Spark's real split size is
    min(maxPartitionBytes, max(openCostInBytes, totalBytes/minPartNum)),
    so with a lowered open cost + raised partition floor Spark splits
    files far below maxPartitionBytes. The guard must refuse the
    no-shuffle path under such configs and results must stay exact."""
    from lucene_solr_spark.sources import load_source_table

    corpus = load_source_table(spark, "/root/testdata/sf0.001")
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, docs_per_seg=256)
    idx = IndexReader(spark, d)
    assert idx._segments_unsplittable()
    q = "spark OR merge OR vector"
    baseline = idx.search_with_total(q, k=20)
    try:
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        spark.conf.set("spark.sql.files.minPartitionNum", "1000")
        assert not idx._segments_unsplittable()
        assert idx.search_with_total(q, k=20) == baseline
    finally:
        spark.conf.unset("spark.sql.files.openCostInBytes")
        spark.conf.unset("spark.sql.files.minPartitionNum")


def test_fastpath_refused_for_multifile_segments(spark, tmp_path):
    """A merged segment written by Spark has multiple parquet files;
    bin-packing has no segment affinity, so the guard must refuse."""
    from lucene_solr_spark.operators.merge import merge_segments
    from lucene_solr_spark.sources import load_source_table

    corpus = load_source_table(spark, "/root/testdata/sf0.001")
    d = str(tmp_path / "idx")
    m = build_index(spark, corpus, d, docs_per_seg=64)
    merge_segments(spark, d, m.seg_ids[:4])
    idx = IndexReader(spark, d)
    files = idx._seg_file_sizes()
    if all(len(fs) == 1 for fs in files.values()):
        pytest.skip("merge produced single-file segments on this config")
    assert not idx._segments_unsplittable()


def test_stats_lru_bounded_and_rank_preserving(spark, corpus, tmp_path,
                                               monkeypatch):
    """The per-query stats LRU (VERDICT r3 wrong #3): driver memory is
    bounded by the cap even when far more distinct terms are queried,
    ranks are identical to the uncached path, and absent terms memoize
    (no repeated scan jobs for a missing term)."""
    from lucene_solr_spark.operators import search as se

    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, docs_per_seg=128)
    monkeypatch.setattr(se, "STATS_CACHE_MAX_TERMS", 5)
    cached = IndexReader(spark, d)
    plain = IndexReader(spark, d, cache_stats=False)
    for q in ["spark", "merge OR vector", "batch AND join",
              "window", "graph OR sql OR txt"]:
        a = [(r["doc_id"], np.float32(r["score"])) for r in
             cached.search(q, k=10).collect()]
        b = [(r["doc_id"], np.float32(r["score"])) for r in
             plain.search(q, k=10).collect()]
        assert a == b, q
        assert len(cached._df_lru) <= 5
    # absent terms memoize as 0 (hit the LRU, excluded from results)
    cached.global_dfs(["zzznotaterm"])
    assert cached._df_lru.get("zzznotaterm") == 0
    assert "zzznotaterm" not in cached.global_dfs(["zzznotaterm"])
