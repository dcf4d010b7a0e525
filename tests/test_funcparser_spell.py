"""Function-query string parser + DirectSpellChecker-analog tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.funcparser import (
    FunctionQueryError, apply_function_query, parse_function_query)
from lucene_solr_spark.operators.build import build_index
from lucene_solr_spark.operators.search import IndexReader
from lucene_solr_spark.sources import load_source_table


@pytest.fixture(scope="module")
def nums(spark):
    return spark.createDataFrame(
        [(1, 10.0, "abc"), (2, 20.0, "abd"), (3, None, "xyz")],
        "id long, x double, s string")


def _vals(df, col):
    return [r["v"] for r in df.select(col.alias("v")).orderBy("id").collect()]


def test_arithmetic_and_nesting(nums):
    c = parse_function_query("sum(product(x,2),div(x,4),1)")
    assert _vals(nums, c)[:2] == [10.0 * 2 + 10.0 / 4 + 1, 20.0 * 2 + 20.0 / 4 + 1]
    c = parse_function_query("recip(abs(sub(x,15)),0.1,1,1)")
    assert _vals(nums, c)[0] == pytest.approx(1.0 / (0.1 * 5 + 1))
    c = parse_function_query("pow(sqrt(x),2)")
    assert _vals(nums, c)[0] == pytest.approx(10.0)
    c = parse_function_query("log(100)")
    assert _vals(nums, c)[0] == pytest.approx(2.0)


def test_scientific_literals(nums):
    c = parse_function_query("linear(x,3.16e-11,1)")
    assert _vals(nums, c)[0] == pytest.approx(3.16e-11 * 10 + 1)


def test_map_min_max_if_def(nums):
    c = parse_function_query("map(x,0,15,1,0)")
    assert _vals(nums, c)[:2] == [1.0, 0.0]
    c = parse_function_query("max(x,15)")
    assert _vals(nums, c)[:2] == [15.0, 20.0]
    c = parse_function_query("def(x,99)")
    assert _vals(nums, c)[2] == 99.0
    c = parse_function_query("if(exists(x),1,0)")
    assert _vals(nums, c) == [1, 1, 0]


def test_query_subquery_scores(spark, nums):
    """query($q[, default]) joins the bound scored DataFrame on the key
    and falls back to the default for non-matching docs (Solr
    QueryValueSource); {!boost} is product(query($q), f(x))."""
    scores = spark.createDataFrame([(1, 2.5), (2, 4.0)],
                                   "doc_id long, score double")
    out = apply_function_query(
        nums.withColumnRenamed("id", "doc_id"),
        "product(query($qq), linear(doc_id, 10, 0))",
        subqueries={"qq": scores}, out_col="b")
    got = {r["doc_id"]: r["b"] for r in out.collect()}
    assert got == {1: 2.5 * 10, 2: 4.0 * 20, 3: 0.0}
    # explicit default replaces the 0 fallback
    out2 = apply_function_query(
        nums.withColumnRenamed("id", "doc_id"), "query($qq, 7)",
        subqueries={"qq": scores}, out_col="b")
    assert {r["doc_id"]: r["b"] for r in out2.collect()}[3] == 7.0


def test_query_param_errors(nums):
    with pytest.raises(FunctionQueryError, match="no bound subquery"):
        apply_function_query(nums, "query($nope)", subqueries={})
    with pytest.raises(FunctionQueryError, match="only valid inside"):
        apply_function_query(nums, "sum($loose, 1)", subqueries={})
    with pytest.raises(FunctionQueryError, match="param reference"):
        apply_function_query(nums, "query(x)", subqueries={})


def test_scale_needs_df(nums):
    with pytest.raises(FunctionQueryError):
        parse_function_query("scale(x,0,1)")
    c = parse_function_query("scale(x,0,1)", df=nums)
    got = sorted(v for v in _vals(nums, c) if v is not None)
    assert got == [0.0, 1.0]


def test_strdist(nums):
    c = parse_function_query("strdist(s,'abc','edit')")
    v = _vals(nums, c)
    assert v[0] == pytest.approx(1.0)
    assert v[1] == pytest.approx(1 - 1 / 3)


def test_geodist():
    c = parse_function_query("geodist(0,0,0,90)")
    # quarter of the mean-earth circumference
    import pyspark.sql as ps

    spark = ps.SparkSession.getActiveSession()
    v = spark.range(1).select(c.alias("v")).collect()[0]["v"]
    assert v == pytest.approx(2 * math.pi * 6371.0087714 / 4, rel=1e-9)


def test_bbox_from_point():
    from lucene_solr_spark.functions.valuesource import bbox_from_point

    # ordinary mid-latitude box: symmetric about the point, lon span
    # wider than lat span by 1/cos(lat)
    lat_min, lat_max, lon_min, lon_max = bbox_from_point(48.2, 16.37, 2000.0)
    assert lat_min < 48.2 < lat_max
    assert lon_min < 16.37 < lon_max
    assert (lon_max - lon_min) > (lat_max - lat_min)
    # pole crossing: longitude widens to the full band
    assert bbox_from_point(89.0, 0.0, 500.0)[2:] == (-180.0, 180.0)
    # antimeridian crossing: reported as lon_min > lon_max (caller ORs)
    _, _, lo, hi = bbox_from_point(0.0, 179.5, 500.0)
    assert lo > hi


def test_parse_errors():
    for bad in ["recip(x,0.1,1", "unknownfn(x)", "recip(x,y,1,1)", "x y"]:
        with pytest.raises(FunctionQueryError):
            parse_function_query(bad)


def test_now_anchor():
    from datetime import datetime

    with pytest.raises(FunctionQueryError):
        parse_function_query("ms(NOW,NOW)")
    c = parse_function_query("ms(NOW,NOW)", now=datetime(2024, 1, 1))
    import pyspark.sql as ps

    spark = ps.SparkSession.getActiveSession()
    assert spark.range(1).select(c.alias("v")).collect()[0]["v"] == 0


# ------------------------------------------------------------- spellcheck

@pytest.fixture(scope="module")
def idx(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spell") / "idx")
    build_index(spark, load_source_table(spark, sf_dir), d, docs_per_seg=128)
    return IndexReader(spark, d)


def test_suggest_similar_ranks_by_dist_then_df(spark, idx, sf_dir):
    got = idx.suggest_similar("spart", max_edits=2, n=5).collect()
    assert got, "expected at least one suggestion"
    # exact oracle from the raw corpus
    from collections import Counter

    from lucene_solr_spark.analysis import tokenize
    from lucene_solr_spark.plans.query import levenshtein
    from lucene_solr_spark.sources import load_documents

    df_counts: Counter = Counter()
    for r in load_documents(spark, sf_dir).select("text").collect():
        for t in set(tokenize(r["text"], "standard")):
            df_counts[t] += 1
    want = sorted(
        ((t, c, levenshtein(t, "spart")) for t, c in df_counts.items()
         if 0 < levenshtein(t, "spart") <= 2),
        key=lambda x: (x[2], -x[1], x[0]),
    )[:5]
    assert [(r["term"], r["df"], r["dist"]) for r in got] == want


def test_suggest_similar_excludes_exact_term(idx):
    rows = idx.suggest_similar("spark", max_edits=2, n=10).collect()
    assert all(r["term"] != "spark" for r in rows)
    assert all(1 <= r["dist"] <= 2 for r in rows)


def test_spellcheck_collate(spark, tmp_path):
    """Misspelled terms replaced by top suggestions; dictionary terms
    pass through; hits = all-terms-MUST total of the collation."""
    from lucene_solr_spark.operators.build import build_index
    from lucene_solr_spark.operators.search import IndexReader

    src = spark.createDataFrame(
        [(0, "r", "p", "c", "t", "spark merge fast"),
         (1, "r", "p", "c", "t", "spark sort"),
         (2, "r", "p", "c", "t", "merge spark value"),
         (3, "r", "p", "c", "t", "nothing here")],
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string")
    d = str(tmp_path / "sc")
    build_index(spark, src, d, docs_per_seg=4)
    idx = IndexReader(spark, d)
    row = idx.spellcheck_collate(["sparkk", "mergee"]).collect()[0]
    assert row["collation"] == "spark merge"
    assert row["hits"] == 2  # docs 0 and 2 contain both
    # dictionary term passes through untouched
    row = idx.spellcheck_collate(["spark", "mergee"]).collect()[0]
    assert row["collation"] == "spark merge" and row["hits"] == 2


def test_wordbreak_and_combine(spark, tmp_path):
    from lucene_solr_spark.operators.build import build_index
    from lucene_solr_spark.operators.search import IndexReader

    src = spark.createDataFrame(
        [(0, "r", "p", "c", "t", "spark merge fast spark"),
         (1, "r", "p", "c", "t", "spark sort ark"),
         (2, "r", "p", "c", "t", "merge spark value")],
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string")
    d = str(tmp_path / "wb")
    build_index(spark, src, d, docs_per_seg=4)
    idx = IndexReader(spark, d)
    # "sparkmerge" -> both ("spark","merge") and ("sp..","..") non-hits
    rows = idx.word_break("sparkmerge").collect()
    assert [(r["left"], r["right"], r["left_df"], r["right_df"])
            for r in rows] == [("spark", "merge", 3, 2)]
    # min-df ranking: "sparkark" -> (spark, ark) min 1 and (sp, arkark)
    # no; ("spark","ark") only
    rows = idx.word_break("sparkark").collect()
    assert [(r["left"], r["right"]) for r in rows] == [("spark", "ark")]
    # combinations: adjacent pair concatenation must be a dict term
    rows = idx.word_combine(["mer", "ge", "spark"]).collect()
    assert [(r["pos"], r["combined"], r["df"]) for r in rows] == [(0, "merge", 2)]
    # nothing combinable -> empty frame with the right schema
    rows = idx.word_combine(["zz", "qq"]).collect()
    assert rows == []


def test_infix_suggest_token_boundary(spark):
    from lucene_solr_spark.operators.search import infix_suggest

    df = spark.createDataFrame(
        [(0, "the vector index", 5), (1, "avector is not a match", 9),
         (2, "vec at start", 3), (3, "no hit here", 7)],
        "id long, text string, w long")
    rows = infix_suggest(df, "text", "w", "vec", key_cols=["id"]).collect()
    # token-boundary prefix: matches docs 0 and 2, NOT the infix of doc 1
    assert [r["id"] for r in rows] == [0, 2]   # weight desc


def test_payload_value_source(spark):
    """payload(field,'term'[,default[,'func']]) over a delimited-payload
    field: per-doc first/min/max/average of occurrence payloads, default
    when absent (DelimitedPayloadTokenFilter float decoder +
    FloatPayloadValueSource)."""
    from lucene_solr_spark.functions import valuesource as vs
    from lucene_solr_spark.functions.funcparser import (
        FunctionQueryError, parse_function_query)
    import pytest as _pytest

    df = spark.createDataFrame(
        [(0, "a|1.0 b|2.0 a|4.0"), (1, "b|3.5"), (2, "a a|0.5")],
        "doc_id long, ptext string")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        vs.payload_fn(df.ptext, "a", "first").alias("f"),
        vs.payload_fn(df.ptext, "a", "min").alias("mn"),
        vs.payload_fn(df.ptext, "a", "max").alias("mx"),
        parse_function_query("payload(ptext,'a')").alias("avg"),
        parse_function_query("payload(ptext,'a',-1.0,'max')").alias("dflt"),
    ).collect()}
    assert (out[0]["f"], out[0]["mn"], out[0]["mx"], out[0]["avg"]) \
        == (1.0, 1.0, 4.0, 2.5)
    assert out[1]["dflt"] == -1.0          # 'a' absent -> default
    assert out[1]["avg"] == 0.0            # Solr default default = 0
    assert out[2]["avg"] == 0.5
    # the term must be a quoted string literal (a bare word would be a
    # field reference)
    with _pytest.raises(FunctionQueryError):
        parse_function_query("payload(ptext)")
