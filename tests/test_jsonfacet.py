"""JSON Facet API request-shape tests."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.jsonfacet import JsonFacetError, json_facet


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("A", "x", 10.0, 1), ("A", "y", 20.0, 2), ("A", "x", 5.0, 1),
         ("B", "x", 7.0, 3), ("B", "y", 9.0, 3)],
        "g string, h string, v double, u long")


def test_terms_with_stats_and_nesting(df):
    out = json_facet(df, {
        "by_g": {"type": "terms", "field": "g",
                 "facet": {"total": "sum(v)", "users": "unique(u)",
                           "by_h": {"type": "terms", "field": "h"}}},
    })
    top = {r["g"]: (r["cnt"], r["total"], r["users"])
           for r in out["by_g"].collect()}
    assert top == {"A": (3, 35.0, 2), "B": (2, 16.0, 1)}
    nested = {(r["g"], r["h"]): r["cnt"]
              for r in out["by_g:g/h"].collect()}
    assert nested == {("A", "x"): 2, ("A", "y"): 1, ("B", "x"): 1, ("B", "y"): 1}


def test_stat_arithmetic_via_funcparser(df):
    out = json_facet(df, {
        "by_g": {"type": "terms", "field": "g",
                 "facet": {"half": "sum(div(v,2))"}},
    })
    got = {r["g"]: r["half"] for r in out["by_g"].collect()}
    assert got == {"A": 17.5, "B": 8.0}


def test_query_and_range_facets(df):
    out = json_facet(df, {
        "big": {"type": "query", "q": "v > 8"},
        "ranges": {"type": "range", "field": "v", "start": 0.0,
                   "end": 30.0, "gap": 10.0},
    })
    assert out["big"].collect()[0]["cnt"] == 3
    buckets = {r["bucket"]: r["cnt"] for r in out["ranges"].collect()}
    assert buckets[0] == 3 and buckets[1] == 1 and buckets[2] == 1


def test_mincount_and_errors(df):
    out = json_facet(df, {"g2": {"type": "terms", "field": "g",
                                 "mincount": 3}})
    assert [r["g"] for r in out["g2"].collect()] == ["A"]
    with pytest.raises(JsonFacetError):
        json_facet(df, {"bad": {"type": "nope"}})
    with pytest.raises(JsonFacetError):
        json_facet(df, {"bad": {"type": "terms", "field": "g",
                                "facet": {"s": "median(v)"}}})


def test_facet_field_prefix_sort_missing(spark):
    from lucene_solr_spark.operators import streamexpr as sx
    df = spark.createDataFrame(
        [("apple",), ("apricot",), ("apple",), ("banana",), (None,), (None,)],
        "f string")
    # prefix restricts before counting; sort=index orders lexicographically
    rows = sx.facet_field(df, "f", prefix="ap", sort="index").collect()
    assert [(r["f"], r["cnt"]) for r in rows] == [("apple", 2), ("apricot", 1)]
    # missing=true appends one NULL bucket counting null docs, after the terms
    rows = sx.facet_field(df, "f", prefix="ap", sort="index",
                          missing=True).collect()
    assert [(r["f"], r["cnt"]) for r in rows] == [
        ("apple", 2), ("apricot", 1), (None, 2)]
    # count-sort default unchanged: desc count, index tiebreak
    rows = sx.facet_field(df, "f").collect()
    assert [(r["f"], r["cnt"]) for r in rows] == [
        ("apple", 2), ("apricot", 1), ("banana", 1)]


def test_sort_by_stat_offset_prefix(df):
    out = json_facet(df, {
        "by_g": {"type": "terms", "field": "g", "sort": "total asc",
                 "facet": {"total": "sum(v)"}},
    })
    assert [r["g"] for r in out["by_g"].collect()] == ["B", "A"]
    out = json_facet(df, {
        "by_h": {"type": "terms", "field": "h", "sort": "index asc",
                 "offset": 1},
    })
    assert [r["h"] for r in out["by_h"].collect()] == ["y"]
    out = json_facet(df, {
        "px": {"type": "terms", "field": "h", "prefix": "x"},
    })
    assert [(r["h"], r["cnt"]) for r in out["px"].collect()] == [("x", 3)]


def test_allbuckets_numbuckets_domain(df):
    out = json_facet(df, {
        "by_g": {"type": "terms", "field": "g", "allBuckets": True,
                 "numBuckets": True, "facet": {"total": "sum(v)"},
                 "domain": {"filter": "v > 6"}},
    })
    ab = out["by_g:allBuckets"].collect()[0]
    assert (ab["cnt"], ab["total"]) == (4, 46.0)   # v>6 drops the 5.0 row
    assert out["by_g:numBuckets"].collect()[0]["numBuckets"] == 2
    top = {r["g"]: r["cnt"] for r in out["by_g"].collect()}
    assert top == {"A": 2, "B": 2}


def test_bad_sort_raises(df):
    with pytest.raises(JsonFacetError):
        json_facet(df, {"x": {"type": "terms", "field": "g",
                              "sort": "nope desc"}})
    with pytest.raises(JsonFacetError):
        json_facet(df, {"x": {"type": "terms", "field": "g",
                              "sort": "count sideways"}})


def test_facet_range_include_hardend_other(spark):
    from lucene_solr_spark.operators import streamexpr as sx
    df = spark.createDataFrame([(float(v),) for v in
                                [0, 5, 10, 10, 15, 23, 25, 30]], "v double")
    # include=lower (default): [10,20) and [20,30) with hardend at 25
    rows = sx.facet_range(df, "v", 10.0, 10.0, end=25.0,
                          hardend=True).collect()
    assert [(r["bucket"], r["cnt"]) for r in rows] == [(0, 3), (1, 1)]
    # hardend=False rounds end up to a whole gap: 25 -> 30, so 25 counts
    rows = sx.facet_range(df, "v", 10.0, 10.0, end=25.0,
                          hardend=False).collect()
    assert [(r["bucket"], r["cnt"]) for r in rows] == [(0, 3), (1, 2)]
    # include=upper: buckets (10,20] and (20,30] — 10s drop to before
    rows = sx.facet_range(df, "v", 10.0, 10.0, end=30.0,
                          include="upper").collect()
    assert [(r["bucket"], r["cnt"]) for r in rows] == [(0, 1), (1, 3)]
    # other=all sections, one pass
    rows = sx.facet_range_other(df, "v", 10.0, 10.0, end=25.0,
                                hardend=False).collect()
    assert [(r["label"], r["cnt"]) for r in rows] == [
        ("before", 2), ("between", 5), ("after", 1)]


def test_pivot_stats_ngroups_daterange(spark):
    from lucene_solr_spark.operators import streamexpr as sx
    df = spark.createDataFrame(
        [("A", "x", 10.0), ("A", "x", 30.0), ("A", "y", 5.0), ("B", "y", 7.0)],
        "g string, h string, v double")
    rows = sx.facet_pivot_stats(
        df, ["g", "h"],
        F.sum("v").alias("sv"), F.max("v").alias("mx")).collect()
    assert [(r["g"], r["h"], r["cnt"], r["sv"], r["mx"]) for r in rows] == [
        ("A", "x", 2, 40.0, 30.0), ("A", "y", 1, 5.0, 5.0),
        ("B", "y", 1, 7.0, 7.0)]
    row = sx.group_ngroups(df, "g").collect()[0]
    assert (row["ngroups"], row["matches"]) == (2, 4)
    ts = spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("2024-01-07 23:00:00",),
         ("2024-01-08 00:30:00",), ("2023-12-31 09:00:00",)],
        "ts string").select(F.col("ts").cast("timestamp_ntz").alias("ts"))
    rows = sx.facet_range_date(ts, "ts", "2024-01-01", 7).collect()
    # week 0 = Jan 1-7, week 1 = Jan 8-14; pre-start row filtered out
    assert [(r["bucket"], r["cnt"]) for r in rows] == [(0, 2), (1, 1)]


def test_block_domain_switches(spark):
    parents = spark.createDataFrame(
        [(1, "big"), (2, "small"), (3, "big")], "pid long, size string")
    children = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (3, "y"), (3, "y")],
        "pid long, tag string")
    out = json_facet(parents, {
        "tags": {"type": "terms", "field": "tag",
                 "domain": {"filter": "size = 'big'",
                            "blockChildren": {"child": children,
                                              "parent_key": "pid",
                                              "child_key": "pid"}}},
    })
    got = {(r["tag"], r["cnt"]) for r in out["tags"].collect()}
    assert got == {("x", 1), ("y", 3)}   # children of parents 1 and 3
    out = json_facet(children, {
        "sizes": {"type": "terms", "field": "size",
                  "domain": {"filter": "tag = 'x'",
                             "blockParent": {"parent": parents,
                                             "parent_key": "pid",
                                             "child_key": "pid"}}},
    })
    got = {(r["size"], r["cnt"]) for r in out["sizes"].collect()}
    assert got == {("big", 1), ("small", 1)}   # parents 1 and 2


def test_facet_contains_exclude(spark):
    from lucene_solr_spark.operators import streamexpr as sx
    df = spark.createDataFrame(
        [("en",), ("en",), ("es",), ("de",), ("fr",)], "f string")
    rows = sx.facet_field(df, "f", contains="e").collect()
    assert [(r["f"], r["cnt"]) for r in rows] == [
        ("en", 2), ("de", 1), ("es", 1)]
    rows = sx.facet_field(df, "f", contains="e",
                          exclude_terms=["en"]).collect()
    assert [(r["f"], r["cnt"]) for r in rows] == [("de", 1), ("es", 1)]


def test_child_transformer(spark):
    from lucene_solr_spark.operators import streamexpr as sx
    parents = spark.createDataFrame([(1, "p1"), (2, "p2"), (3, "p3")],
                                    "pid long, name string")
    children = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (1, "c", 30), (2, "d", 5)],
        "pid long, tag string, v long")
    out = sx.child_transformer(parents, children, "pid", "pid",
                               ["tag", "v"], limit=2,
                               order=F.desc("v")).collect()
    rows = {r["pid"]: r for r in out}
    # parent 1: top-2 children by v desc, packed in rank order
    kids = [(d["tag"], d["v"]) for d in rows[1]["child_docs"]]
    assert kids == [("c", 30), ("b", 20)]
    assert [(d["tag"], d["v"]) for d in rows[2]["child_docs"]] == [("d", 5)]
    assert rows[3]["child_docs"] is None          # childless parent intact
