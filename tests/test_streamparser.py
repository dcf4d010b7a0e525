"""Streaming-expression text parser tests (StreamExpressionParser analog)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.streamparser import (
    StreamExprError, parse_stream_expr)


@pytest.fixture(scope="module")
def tables(spark):
    li = spark.createDataFrame(
        [("A", "F", 10.0, 1), ("A", "F", 20.0, 2), ("B", "O", 5.0, 3),
         ("B", "O", 7.0, 4), ("B", "F", 9.0, 5), ("A", "O", 30.0, 6)],
        "flag string, status string, qty double, id long")
    cust = spark.createDataFrame(
        [(1, "BUILDING"), (2, "AUTO"), (3, "BUILDING")],
        "id long, seg string")
    return {"li": li, "cust": cust}


def test_search_q_and_fl_and_sort(tables):
    df = parse_stream_expr(
        'search(li, q="qty:[7 TO 20]", fl="id,qty", sort="qty desc")', tables)
    assert df.columns == ["id", "qty"]
    assert [r["id"] for r in df.collect()] == [2, 1, 5, 4]


def test_search_equality_q(tables):
    df = parse_stream_expr('search(li, q="flag:A", fl="id")', tables)
    assert sorted(r["id"] for r in df.collect()) == [1, 2, 6]


def test_rollup_having_matches_sql(tables, spark):
    df = parse_stream_expr(
        'having(rollup(search(li, q="*:*", fl="flag,status,qty", '
        'sort="flag asc"), over="flag,status", count(*), sum(qty)), '
        'gt(count(*), 1))', tables)
    got = sorted(map(tuple, df.collect()))
    tables["li"].createOrReplaceTempView("v_li")
    want = sorted(map(tuple, spark.sql(
        "SELECT flag, status, COUNT(*), SUM(qty) FROM v_li "
        "GROUP BY flag, status HAVING COUNT(*) > 1").collect()))
    assert got == want


def test_top_unique_join_composition(tables):
    df = parse_stream_expr(
        'top(innerJoin(search(li, q="*:*", fl="id,flag,qty", sort="id asc"), '
        'search(cust, q="*:*", fl="id,seg", sort="id asc"), on="id"), '
        'n=2, sort="qty desc")', tables)
    rows = df.collect()
    assert [r["id"] for r in rows] == [2, 1]
    assert rows[0]["seg"] == "AUTO"
    uniq = parse_stream_expr(
        'unique(search(li, q="*:*", fl="flag,qty", sort="flag asc,qty asc"), '
        'over="flag")', tables)
    assert uniq.count() == 2


def test_select_rename_and_facet(tables):
    df = parse_stream_expr(
        'select(search(li, q="*:*", fl="id,qty", sort="id asc"), id, qty=quantity)',
        tables)
    assert df.columns == ["id", "quantity"]
    f = parse_stream_expr('facet(li, q="flag:B", buckets="status")', tables)
    got = {(r["status"], r["cnt"]) for r in f.collect()}
    assert got == {("O", 2), ("F", 1)}


def test_errors(tables):
    for bad in [
        'bogus(li)',
        'search(nope, q="*:*")',
        'having(search(li, q="*:*"))',
        'search(li, q="qty>5")',
        'rollup(search(li, q="*:*"), over="flag") trailing',
    ]:
        with pytest.raises(StreamExprError):
            parse_stream_expr(bad, tables)


def test_text_timeseries_with_datemath_bounds(spark, sf_dir):
    """timeseries() text form == the timeseries_stream combinator, with
    Solr date-math start/end bounds applied [start, end)."""
    from lucene_solr_spark.operators import streamexpr as sx

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select("event_id", "ts", "value"))
    got = parse_stream_expr(
        'timeseries(events, q="*:*", field=ts, gap="+1DAY", '
        'start="2024-01-10T06:30:00Z/DAY", '
        'end="2024-01-10T06:30:00Z/DAY+7DAYS", count(*))',
        {"events": ev})
    from lucene_solr_spark.functions.datemath import parse_date_math
    lo = parse_date_math("2024-01-10T06:30:00Z/DAY").isoformat(sep=" ")
    hi = parse_date_math("2024-01-10T06:30:00Z/DAY+7DAYS").isoformat(sep=" ")
    want = sx.timeseries_stream(
        ev.filter((F.col("ts") >= F.lit(lo).cast(ev.schema["ts"].dataType))
                  & (F.col("ts") < F.lit(hi).cast(ev.schema["ts"].dataType))),
        "ts", "1 day", F.count(F.lit(1)).alias("count(*)"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() == 7


def test_text_parallel_daemon_topic(spark, sf_dir):
    """parallel() is an explicit repartition (row-preserving), daemon()
    evaluates its wrapped expression once, topic() returns the q-matching
    rows — the batch faces of the Solr worker/daemon/pub-sub streams."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = parse_stream_expr(
        'search(lineitem, q="l_quantity:[45 TO *]", fl="l_orderkey,l_quantity")',
        {"lineitem": li})
    par = parse_stream_expr(
        'parallel(search(lineitem, q="l_quantity:[45 TO *]", '
        'fl="l_orderkey,l_quantity"), workers=6, partitionKeys=l_orderkey)',
        {"lineitem": li})
    assert par.rdd.getNumPartitions() == 6
    assert sorted(map(tuple, par.collect())) == sorted(map(tuple, base.collect()))
    dmn = parse_stream_expr(
        'daemon(rollup(search(lineitem, q="*:*", fl="l_returnflag,l_quantity", '
        'sort="l_returnflag asc"), over="l_returnflag", count(*)), '
        'id=d1, runInterval=1000)',
        {"lineitem": li})
    assert {r["l_returnflag"] for r in dmn.collect()} == \
        {r["l_returnflag"] for r in li.select("l_returnflag").distinct().collect()}
    top = parse_stream_expr('topic(lineitem, q="l_linestatus:F")',
                            {"lineitem": li})
    assert top.count() == li.filter(F.col("l_linestatus") == "F").count()


def test_gap_interval_parse():
    from lucene_solr_spark.operators.streamparser import (StreamExprError,
                                                          _gap_interval)
    assert _gap_interval("+1DAY") == "1 day"
    assert _gap_interval("12HOURS") == "12 hour"
    assert _gap_interval("+30MINUTES") == "30 minute"
    with pytest.raises(StreamExprError):
        _gap_interval("+1MONTH")


def test_fetch_significant_nodes_stats(spark, sf_dir):
    from lucene_solr_spark.operators.streamparser import parse_stream_expr

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    env = {"orders": orders, "customer": cust}
    out = parse_stream_expr(
        'fetch(customer, search(orders, q="o_totalprice:[400000 TO *]", '
        'fl="o_orderkey,o_custkey"), on="o_custkey=c_custkey", '
        'fl="c_mktsegment")', env)
    exp = (orders.filter(F.col("o_totalprice") >= 400000)
           .select("o_orderkey", "o_custkey")
           .join(cust.select(F.col("c_custkey").alias("o_custkey"),
                             "c_mktsegment"), "o_custkey", "left"))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, exp.collect()))

    sig = parse_stream_expr(
        'significantTerms(orders, q="o_totalprice:[400000 TO *]", '
        'field=o_orderpriority, limit=3)', env)
    assert 0 < sig.count() <= 3

    st = parse_stream_expr(
        'stats(orders, q="o_orderstatus:F", sum(o_totalprice), count(*))', env)
    row = st.collect()[0]
    f = orders.filter(F.col("o_orderstatus") == "F")
    assert row["count(*)"] == f.count()

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 9)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "src long")
    out = parse_stream_expr(
        'nodes(edges, search(seeds, q="*:*", fl="src"), walk="src->dst", '
        'hops=2)', {"edges": edges, "seeds": seeds})
    got = {(r["node"], r["level"]) for r in out.collect()}
    assert got == {(1, 0), (2, 1), (3, 2)}


def test_cartesian_product_stream(spark):
    """cartesianProduct(stream, field): one tuple per value of the
    multi-valued field, other columns carried through; empty arrays
    yield no tuples (Solr CartesianProductStream)."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.operators.streamparser import parse_stream_expr

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["c"]), (3, [])],
        "id long, vals array<string>")
    out = parse_stream_expr(
        'cartesianProduct(search(t, q="*:*"), vals)', {"t": df})
    rows = sorted((r["id"], r["vals"]) for r in out.collect())
    assert rows == [(1, "a"), (1, "b"), (2, "c")]
    assert dict(out.dtypes)["vals"] == "string"


def test_join_qparser(spark):
    """{!join from=F to=T}body: to-side docs whose T appears among F
    values of from-side docs matching body (ScoreMode.None)."""
    import pytest as _pytest

    from lucene_solr_spark.operators.streamparser import (
        StreamExprError, join_query)

    frm = spark.createDataFrame(
        [(1, 10.0), (1, 500.0), (2, 40.0), (3, 999.0)],
        "k long, v double")
    to = spark.createDataFrame([(1,), (2,), (3,), (4,)], "ck long")
    out = join_query("{!join from=k to=ck}v:[100 TO *]", frm, to)
    assert sorted(r["ck"] for r in out.collect()) == [1, 3]
    # empty body matches everything
    out_all = join_query("{!join from=k to=ck}", frm, to)
    assert sorted(r["ck"] for r in out_all.collect()) == [1, 2, 3]
    with _pytest.raises(StreamExprError):
        join_query("{!terms f=ck}1", frm, to)
