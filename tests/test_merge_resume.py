"""Merge, checkpoint/resume, CheckIndex, deterministic doc_ids
(SURVEY.md §5.2.4-5.2.5, BASELINE.json north_rule)."""

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.build import build_index, read_manifest
from lucene_solr_spark.operators.merge import (
    force_merge,
    merge_segments,
    plan_merges,
    vacuum,
)
from lucene_solr_spark.operators.search import IndexReader
from lucene_solr_spark.operators.verify import verify_index
from lucene_solr_spark.sources import assign_doc_ids, load_source_table, synth_repo_files
from tests.oracle import OracleIndex

MERGE_QUERIES = ["spark", "the OR spark OR vector", "join AND window",
                 '"merge line"', "batch OR stream NOT join"]


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_source_table(spark, sf_dir).cache()


def _mtimes(index_dir, segs):
    out = {}
    for seg in segs:
        d = f"{index_dir}/postings/seg={seg}"
        out[seg] = max(os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d))
    return out


def test_resume_skips_completed_segments(spark, corpus, tmp_path):
    d = str(tmp_path / "idx")
    # simulate a failed run: only the first half of the doc space done
    half = corpus.filter(F.col("doc_id") < 256)
    m1 = build_index(spark, half, d, docs_per_seg=128)
    assert m1.seg_ids == [0, 1]
    before = _mtimes(d, m1.seg_ids)
    time.sleep(1.1)

    m2 = build_index(spark, corpus, d, docs_per_seg=128, resume=True)
    assert set(m2.seg_ids) > set(m1.seg_ids)
    assert m2.gen == m1.gen + 1
    # completed segments were NOT recomputed (files untouched)
    after = _mtimes(d, m1.seg_ids)
    assert after == before

    # resumed index == fresh build, query-for-query
    d2 = str(tmp_path / "fresh")
    build_index(spark, corpus, d2, docs_per_seg=128)
    r1, r2 = IndexReader(spark, d), IndexReader(spark, d2)
    assert r1.doc_count == r2.doc_count and r1.sum_dl == r2.sum_dl
    for q in MERGE_QUERIES:
        assert r1.search_with_total(q, k=20) == r2.search_with_total(q, k=20)


def test_noop_resume(spark, corpus, tmp_path):
    d = str(tmp_path / "idx")
    m1 = build_index(spark, corpus, d, docs_per_seg=256)
    m2 = build_index(spark, corpus, d, docs_per_seg=256, resume=True)
    assert m2.gen == m1.gen + 1
    assert m2.seg_ids == m1.seg_ids
    assert [s["input_fingerprint"] for s in m2.segments] == \
           [s["input_fingerprint"] for s in m1.segments]


def test_merge_preserves_results(spark, corpus, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, docs_per_seg=64)  # 8 segments
    r_before = IndexReader(spark, d)
    expected = {q: r_before.search_with_total(q, k=30) for q in MERGE_QUERIES}
    m0 = read_manifest(d)

    m1 = merge_segments(spark, d, m0.seg_ids[:4])
    assert len(m1.segments) == len(m0.segments) - 3
    merged = next(s for s in m1.segments if s["source"].startswith("merge("))
    assert merged["n_docs"] == sum(
        s["n_docs"] for s in m0.segments if s["seg"] in m0.seg_ids[:4]
    )

    r_after = IndexReader(spark, d)
    assert r_after.doc_count == r_before.doc_count
    for q in MERGE_QUERIES:
        got = r_after.search_with_total(q, k=30)
        assert got == expected[q], f"post-merge mismatch for {q!r}"

    rep = verify_index(spark, d, corpus)
    assert rep["ok"], rep["problems"]


def test_force_merge_and_vacuum(spark, corpus, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, docs_per_seg=32)  # 16 segments
    m = read_manifest(d)
    assert len(m.segments) == 16
    plans = plan_merges(m, segs_per_tier=4, max_merge_at_once=4)
    assert plans and all(2 <= len(g) <= 4 for g in plans)

    oracle = OracleIndex(sorted(
        (r["doc_id"], r["content"]) for r in corpus.select("doc_id", "content").collect()
    ))
    m2 = force_merge(spark, d, segs_per_tier=4, max_merge_at_once=4)
    assert len(m2.segments) <= 4
    removed = vacuum(d)
    assert removed  # old segment dirs actually deleted
    r = IndexReader(spark, d)
    for q in MERGE_QUERIES:
        got, total = r.search_with_total(q, k=25)
        exp = oracle.search(q, k=25)
        assert [(dd, np.float32(s)) for dd, s in got] == \
               [(dd, np.float32(s)) for dd, s in exp.score_docs]
        assert total == exp.total_hits
    rep = verify_index(spark, d, corpus)
    assert rep["ok"], rep["problems"]


def test_verify_catches_corruption(spark, corpus, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, docs_per_seg=256)
    # corrupt: source row content differs from what was indexed
    bad_src = corpus.withColumn(
        "content",
        F.when(F.col("doc_id") == 3, F.lit("tampered")).otherwise(F.col("content")),
    )
    rep = verify_index(spark, d, bad_src)
    assert not rep["ok"]
    assert any("sha256" in p for p in rep["problems"])


def test_assign_doc_ids_deterministic(spark):
    src = synth_repo_files(spark, 400, seed=7, num_partitions=5)
    a = assign_doc_ids(src, num_partitions=3)
    b = assign_doc_ids(src, num_partitions=6)
    rows_a = {(r["repo"], r["path"], r["commit"]): r["doc_id"]
              for r in a.select("repo", "path", "commit", "doc_id").collect()}
    rows_b = {(r["repo"], r["path"], r["commit"]): r["doc_id"]
              for r in b.select("repo", "path", "commit", "doc_id").collect()}
    assert rows_a == rows_b
    # equals the pure-Python rank over the sort key
    expected = {k: i for i, k in enumerate(sorted(rows_a))}
    assert rows_a == expected


def test_hot_term_sharded_merge(spark, corpus, tmp_path):
    """Force the hot-term shard path: merge with a tiny shard_postings
    so frequent terms split into multiple doc-ordered rows; searches
    must stay rank-identical to the unsharded index and CheckIndex
    must pass."""
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, docs_per_seg=64)  # 8 segments
    baseline = IndexReader(spark, d)
    expected = {q: baseline.search_with_total(q, k=30) for q in MERGE_QUERIES}

    m0 = read_manifest(d)
    # 128 == one block per shard (the minimum after block-alignment
    # rounding); the tiny-vocab corpus has df ~500 per term -> 4 shards
    m1 = merge_segments(spark, d, m0.seg_ids, shard_postings=128)
    assert len(m1.seg_ids) == 1

    merged = IndexReader(spark, d)
    shards = (
        merged.postings.groupBy("term")
        .count().filter(F.col("count") > 1).count()
    )
    assert shards > 0, "expected at least one multi-shard term"
    for q in MERGE_QUERIES:
        assert merged.search_with_total(q, k=30) == expected[q], q
    report = verify_index(spark, d, source=corpus)
    assert report["ok"], report["problems"]


def test_second_level_sharded_merge(spark, corpus, tmp_path):
    """ADVICE r1 (medium): re-merging ALREADY-SHARDED segments must not
    interleave doc ranges across a term's output rows. Two first-level
    merges each produce sharded hot terms (tiny shard_postings), then
    the second-level merge combines them; searches must stay
    rank-identical to the pre-merge index and CheckIndex must pass."""
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, docs_per_seg=64)  # 8 segments
    baseline = IndexReader(spark, d)
    expected = {q: baseline.search_with_total(q, k=30) for q in MERGE_QUERIES}

    m0 = read_manifest(d)
    merge_segments(spark, d, m0.seg_ids[:4], shard_postings=128)
    latest = merge_segments(spark, d, m0.seg_ids[4:], shard_postings=128)
    # verify hot (multi-shard) terms exist in the inputs to the final merge
    rdr_mid = IndexReader(spark, d)
    n_sharded = (
        rdr_mid.postings.filter(F.col("shard") > 0)
        .select("term").distinct().count()
    )
    assert n_sharded > 0, "expected sharded terms before the second-level merge"

    m_final = merge_segments(spark, d, latest.seg_ids, shard_postings=128)
    assert len(m_final.seg_ids) == 1

    merged = IndexReader(spark, d)
    for q in MERGE_QUERIES:
        assert merged.search_with_total(q, k=30) == expected[q], q
    report = verify_index(spark, d, source=corpus)
    assert report["ok"], report["problems"]


def test_resume_with_sparse_doc_ids(spark, corpus, tmp_path):
    """ADVICE r1 (low): a committed segment covers its CONSTRUCTION
    range [seg*dps, (seg+1)*dps), not [doc_base, doc_base+n_docs); with
    sparse caller-assigned doc_ids the old interval re-processed a
    committed segment's leftover ids under the same seg id, and the
    atomic rename replaced that segment's parquet with only the
    leftovers — silent data loss on resume."""
    d = str(tmp_path / "idx")
    sparse = corpus.withColumn("doc_id", F.col("doc_id") * 3)
    # segs 0..2 (ranges [0,64) [64,128) [128,192)) are COMPLETE for the
    # full source too: every source id < 192 lands there
    first = sparse.filter(F.col("doc_id") < 192)
    build_index(spark, first, d, docs_per_seg=64)
    m1 = read_manifest(d)
    assert all(s["doc_hi"] == (s["seg"] + 1) * 64 for s in m1.segments)
    committed = set(m1.seg_ids)

    mtimes_before = _mtimes(d, sorted(committed))
    build_index(spark, sparse, d, docs_per_seg=64)
    assert _mtimes(d, sorted(committed)) == mtimes_before, \
        "resume must not rewrite completed sparse segments"

    rdr = IndexReader(spark, d)
    ids = [r["doc_id"] for r in rdr.docmeta.select("doc_id").collect()]
    n_src = sparse.count()
    assert len(ids) == n_src, "docs lost or duplicated on sparse resume"
    assert len(set(ids)) == n_src
