"""edismax multi-field qf (SURVEY.md §2.4 ExtendedDismaxQParser)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.build import build_index
from lucene_solr_spark.operators.edismax import edismax_search, parse_qf
from lucene_solr_spark.operators.search import IndexReader
from lucene_solr_spark.sources import load_source_table


def test_parse_qf():
    assert parse_qf("content^2 path") == {"content": 2.0, "path": 1.0}
    assert parse_qf("a^0.5 b c^3") == {"a": 0.5, "b": 1.0, "c": 3.0}
    with pytest.raises(ValueError):
        parse_qf("bad^^2")


@pytest.fixture(scope="module")
def readers(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("edismax")
    corpus = load_source_table(spark, "/root/testdata/sf0.001")
    d1 = str(base / "content")
    build_index(spark, corpus, d1, docs_per_seg=256, analyzer="simple")
    d2 = str(base / "path")
    build_index(spark, corpus.withColumn("path_text", F.col("path")), d2,
                docs_per_seg=256, analyzer="simple", field_name="path_text")
    return {"content": IndexReader(spark, d1),
            "path_text": IndexReader(spark, d2)}


def test_edismax_cross_field(spark, readers):
    # 'docs' only matches the path field; 'spark' only the content field
    rows = edismax_search(readers, "content^2 path_text", "spark docs",
                          tiebreak=0.0, mm=1, k=5).collect()
    assert len(rows) == 5
    # with mm=2 only docs matching BOTH clauses survive; every doc has
    # 'docs' in its path, so mm=2 == docs containing 'spark'
    both = edismax_search(readers, "content^2 path_text", "spark docs",
                          tiebreak=0.0, mm=2, k=500).collect()
    n_spark = readers["content"].count("spark")
    assert len(both) == n_spark

    # qf boost monotonicity: doubling the content boost doubles the
    # content clause contribution for a content-only clause
    a = {r["doc_id"]: r["score"] for r in
         edismax_search(readers, "content^1", "spark", k=500).collect()}
    b = {r["doc_id"]: r["score"] for r in
         edismax_search(readers, "content^2", "spark", k=500).collect()}
    assert set(a) == set(b)
    for d in a:
        assert abs(b[d] - 2 * a[d]) < 1e-6


def test_edismax_tiebreak(spark, readers):
    # tie=1.0 degenerates to plain sum across fields; 'txt' matches all
    # docs in path only, 'value' in content only
    t0 = {r["doc_id"]: r["score"] for r in
          edismax_search(readers, "content path_text", "value", tiebreak=0.0,
                         k=1000).collect()}
    t1 = {r["doc_id"]: r["score"] for r in
          edismax_search(readers, "content path_text", "value", tiebreak=1.0,
                         k=1000).collect()}
    assert t0 == t1  # single-field match: tie has no effect


def test_edismax_pf_adds_phrase_boost(spark, readers):
    """pf: docs containing the exact phrase gain the phrase dismax on
    top of the main score; others keep the main score unchanged."""
    from lucene_solr_spark.operators.edismax import (edismax_pf_bf,
                                                     edismax_score_all)

    base = {r["doc_id"]: r["score"] for r in edismax_score_all(
        readers, "content^2 path_text", "spark merge", 0.1, 1).collect()}
    out = {r["doc_id"]: r["score"] for r in edismax_pf_bf(
        readers, "content^2 path_text", "spark merge",
        pf="content^1.5", tiebreak=0.1, mm=1).collect()}
    assert set(out) == set(base)  # pf never admits new docs
    boosted = {d for d in out if out[d] > base[d] + 1e-12}
    texts = {r["doc_id"]: r["content"] for r in load_source_table(
        spark, "/root/testdata/sf0.001").collect()}
    for d in out:
        has_phrase = "spark merge" in texts[d]
        assert (d in boosted) == has_phrase, (d, texts[d][:60])


def test_edismax_bf_additive(spark, readers):
    """bf: score + f(doc) for every matching doc."""
    from lucene_solr_spark.operators.edismax import (edismax_pf_bf,
                                                     edismax_score_all)

    src = load_source_table(spark, "/root/testdata/sf0.001").select("doc_id")
    base = {r["doc_id"]: r["score"] for r in edismax_score_all(
        readers, "content^2", "spark", 0.0, 1).collect()}
    out = {r["doc_id"]: r["score"] for r in edismax_pf_bf(
        readers, "content^2", "spark", bf="recip(doc_id,0.001,1,1)",
        bf_source=src).collect()}
    for d, s in out.items():
        assert abs(s - (base[d] + 1.0 / (0.001 * d + 1.0))) < 1e-9
