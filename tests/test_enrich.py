"""Highlighting, MoreLikeThis, suggester, grouping (SURVEY.md §2.13)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators import streamexpr as sx
from lucene_solr_spark.operators.build import build_index
from lucene_solr_spark.operators.highlight import highlight, highlight_text
from lucene_solr_spark.operators.search import IndexReader
from lucene_solr_spark.sources import load_source_table


@pytest.fixture(scope="module")
def reader(spark, sf_dir, tmp_path_factory):
    corpus = load_source_table(spark, sf_dir).cache()
    d = str(tmp_path_factory.mktemp("enrich") / "idx")
    build_index(spark, corpus, d, docs_per_seg=128)
    return IndexReader(spark, d), corpus


def test_highlight_text_basic():
    snips = highlight_text("The quick Spark engine sparkles", ["spark"])
    assert len(snips) == 1
    assert "<em>Spark</em>" in snips[0]
    assert "sparkles" in snips[0] and "<em>sparkles</em>" not in snips[0]


def test_highlight_text_passages_ranked():
    text = ("alpha beta gamma. " * 20 + "spark merge spark. " +
            "delta " * 40 + "spark.")
    snips = highlight_text(text, ["spark", "merge"], max_passages=2)
    assert len(snips) == 2
    # best passage (3 matches) first
    assert snips[0].count("<em>") == 3
    assert snips[1].count("<em>") == 1


def test_highlight_df(reader):
    idx, corpus = reader
    top = idx.search("content:spark", k=5)
    hits = idx.fetch(top).join(
        corpus.select("doc_id", "content"), "doc_id"
    )
    out = highlight(hits, "content", ["spark"]).collect()
    assert len(out) == 5
    for r in out:
        assert r["snippets"] and all("<em>" in s for s in r["snippets"])


def test_highlight_sql_oracle_matches_kernel(sf_dir):
    """The DuckDB snippet oracle (__spark_entry__._highlight_sql) must
    replay highlight_text EXACTLY — n_snippets and the rendered first
    snippet — over EVERY doc of the corpus, not just the top-k hits
    (the snippet CTEs are driven here without the BM25 hit filter)."""
    import duckdb

    import __spark_entry__ as entry

    sql = entry._highlight_sql("spark", k=5)
    # swap the hits CTE for the whole corpus: exercise every doc
    body = sql.split("docs AS (", 1)[1]
    all_sql = (
        "WITH hits AS (SELECT doc_id FROM documents),\n    docs AS ("
        + body
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')")
    got = {r[0]: (r[1], r[2]) for r in con.execute(all_sql).fetchall()}
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    assert len(got) == len(docs)
    for did, text in docs:
        snips = highlight_text(text, ["spark"])
        want = (len(snips), snips[0] if snips else None)
        assert got[did] == want, (did, want, got[did])


def test_more_like_this(reader):
    idx, corpus = reader
    seed = corpus.filter(F.col("doc_id") == 7).collect()[0]["content"]
    out = idx.more_like_this(seed, k=10).collect()
    assert out
    # the seed document itself must be among its own nearest docs
    # (not necessarily first: BM25 length normalization can prefer
    # shorter docs dense in the same terms)
    assert 7 in [r["doc_id"] for r in out]
    q = idx.more_like_this_query(seed)
    assert 1 <= len(q.should) <= 25


def test_suggest(reader):
    idx, _ = reader
    sugg = idx.suggest("s", n=5)
    assert sugg and all(t.startswith("s") for t, _ in sugg)
    # ranked by docFreq desc
    dfs = [df for _, df in sugg]
    assert dfs == sorted(dfs, reverse=True)
    assert idx.suggest("zzzznope") == []


def test_group_top_k(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = sx.group_top_k(orders, "o_custkey", 2,
                         F.desc("o_totalprice"), F.asc("o_orderkey"))
    counts = out.groupBy("o_custkey").count().collect()
    assert all(r["count"] <= 2 for r in counts)
    # rank 1 matches collapse()
    best = {r["o_custkey"]: r["o_orderkey"]
            for r in out.filter(F.col("group_rank") == 1).collect()}
    coll = {r["o_custkey"]: r["o_orderkey"] for r in sx.collapse(
        orders, "o_custkey", F.desc("o_totalprice"), F.asc("o_orderkey")
    ).collect()}
    assert best == coll
