"""Date-math parser + graph streaming ops (SURVEY.md §2.10, §2.13)."""

from datetime import datetime

import pytest

from lucene_solr_spark.functions.datemath import parse_date_math


NOW = datetime(2024, 3, 15, 10, 30, 45, 123456)


def test_datemath_now_round_and_shift():
    assert parse_date_math("NOW/DAY", NOW) == datetime(2024, 3, 15)
    assert parse_date_math("NOW/DAY+7DAYS", NOW) == datetime(2024, 3, 22)
    assert parse_date_math("NOW/HOUR-30MINUTES", NOW) == datetime(2024, 3, 15, 9, 30)
    assert parse_date_math("NOW/YEAR", NOW) == datetime(2024, 1, 1)
    assert parse_date_math("NOW+2YEARS/MONTH", NOW) == datetime(2026, 3, 1)


def test_datemath_anchor_and_month_clamp():
    assert parse_date_math("2024-01-31T00:00:00Z+1MONTH") == datetime(2024, 2, 29)
    assert parse_date_math("2024-01-15T10:30:00Z/MONTH+1MONTH-3DAYS") == \
        datetime(2024, 1, 29)
    with pytest.raises(ValueError):
        parse_date_math("NOW/FORTNIGHT", NOW)
    with pytest.raises(ValueError):
        parse_date_math("NOW*3DAYS", NOW)


def test_graph_gather_and_shortest_path(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.operators.graph import (
        gather_nodes,
        shortest_path_length,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("b", "a"), ("c", "b"),
         ("d", "c"), ("x", "y"), ("y", "x")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "src string")
    got = {(r["node"], r["level"])
           for r in gather_nodes(edges, seeds, "src", "dst", hops=2).collect()}
    assert got == {("a", 0), ("b", 1), ("c", 2)}

    assert shortest_path_length(edges, "a", "d", "src", "dst") == 3
    assert shortest_path_length(edges, "a", "y", "src", "dst", 4) is None
