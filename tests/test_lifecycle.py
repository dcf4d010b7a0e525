"""End-to-end index lifecycle torture test: build -> resume -> delete
-> merge -> expunge across phases, rank-identity asserted against the
in-repo Lucene-semantics oracle at every step (SURVEY.md §5; the
integration pin for the round-2 mutation machinery)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.build import build_index, read_manifest
from lucene_solr_spark.operators.delete import delete_documents
from lucene_solr_spark.operators.merge import expunge_deletes, force_merge
from lucene_solr_spark.operators.search import IndexReader
from lucene_solr_spark.operators.verify import verify_index
from lucene_solr_spark.sources import load_source_table
from tests.oracle import OracleIndex

QUERIES = ["spark", "merge OR vector OR the", "join AND window",
           '"merge line"', "spar*"]


@pytest.fixture(scope="module")
def corpus(spark):
    return load_source_table(spark, "/root/testdata/sf0.001").cache()


def _oracle_for(rows):
    return OracleIndex(sorted((r["doc_id"], r["content"]) for r in rows))


def _check_rank_identity(idx, oracle, deleted=frozenset(), k=30):
    """Engine topk/totals == oracle scored over ITS corpus, minus
    tombstones (delete-blind scores, live totals/membership)."""
    for q in QUERIES:
        got, total = idx.search_with_total(q, k=k)
        exp_all = oracle.search(q, k=10_000)
        live = [(d, np.float32(s)) for d, s in exp_all.score_docs
                if d not in deleted]
        assert [(d, np.float32(s)) for d, s in got] == live[:k], q
        assert total == len(live), q


def test_lifecycle_build_delete_merge_purge(spark, corpus, tmp_path):
    d = str(tmp_path / "idx")
    rows = corpus.select("doc_id", "content").collect()
    n = len(rows)

    # phase 1: partial build (segment-aligned prefix)
    build_index(spark, corpus.filter(F.col("doc_id") < 256), d, docs_per_seg=64)
    _check_rank_identity(IndexReader(spark, d),
                         _oracle_for([r for r in rows if r["doc_id"] < 256]))

    # phase 2: resume to the full corpus
    build_index(spark, corpus, d, docs_per_seg=64)
    oracle_full = _oracle_for(rows)
    idx = IndexReader(spark, d)
    _check_rank_identity(idx, oracle_full)
    assert verify_index(spark, d, corpus)["ok"]

    # phase 3: tombstone one doc per segment range (spread so the later
    # expunge rewrites EVERY segment -> fully live stats)
    m = read_manifest(d)
    victims = sorted({s["doc_base"] + 1 for s in m.segments if s["n_docs"] > 1})
    delete_documents(spark, d, victims)
    idx = IndexReader(spark, d)
    _check_rank_identity(idx, oracle_full, deleted=frozenset(victims))

    # phase 4: tiered merge keeps tombstone semantics
    force_merge(spark, d, segs_per_tier=3, max_merge_at_once=4)
    idx = IndexReader(spark, d)
    _check_rank_identity(idx, oracle_full, deleted=frozenset(victims))

    # phase 5: physical purge -> engine == a fresh oracle over ONLY the
    # live docs (live stats), exact scores
    expunge_deletes(spark, d)
    live_rows = [r for r in rows if r["doc_id"] not in set(victims)]
    oracle_live = _oracle_for(live_rows)
    idx = IndexReader(spark, d)
    _check_rank_identity(idx, oracle_live)
    assert idx.doc_count == n - len(victims)
    assert idx.count("*") == n - len(victims)
