"""let/get/eval math-expression surface (SURVEY.md §2.9-2.10).

Mirrors `[U] solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/*`
(Solr math expressions: ``let(a=search(...), b=col(a, price),
eval(corr(b, c)))``): named tuple-stream bindings + a library of
statistical evaluators over stream columns.

Spark-first mapping: a binding IS a temp view (let), ``get`` is a view
reference inside the expression, and the evaluator library maps to
Catalyst aggregate functions — mean/stddev/percentile/corr/covariance/
regress all run as distributed partial+final aggregates instead of
Solr's collect-into-driver-array model, so the same expression works at
10^12 rows.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["let_eval", "describe", "corr", "regress"]


def let_eval(spark: SparkSession, bindings: Dict[str, DataFrame],
             expr_sql: str) -> DataFrame:
    """``let(name=stream, ...)`` + ``eval(<expression>)``: bind each
    stream as a view and evaluate the SQL expression against them."""
    for name, df in bindings.items():
        df.createOrReplaceTempView(name)
    return spark.sql(expr_sql)


def describe(df: DataFrame, fld: str) -> DataFrame:
    """Solr ``describe()`` evaluator: the moment bundle in one agg."""
    c = F.col(fld)
    return df.agg(
        F.count(c).alias("n"), F.min(c).alias("min"), F.max(c).alias("max"),
        F.avg(c).alias("mean"), F.stddev_samp(c).alias("stddev"),
        F.expr(f"percentile({fld}, 0.5)").alias("median"),
        F.skewness(c).alias("skewness"), F.kurtosis(c).alias("kurtosis"),
    )


def corr(df: DataFrame, x: str, y: str) -> DataFrame:
    """``corr()`` evaluator: Pearson correlation as a Catalyst agg."""
    return df.agg(F.corr(F.col(x), F.col(y)).alias("corr"))


def regress(df: DataFrame, x: str, y: str) -> DataFrame:
    """``regress()`` evaluator: simple OLS slope/intercept/R^2 from
    sufficient statistics (one distributed pass)."""
    return df.agg(
        F.regr_slope(F.col(y), F.col(x)).alias("slope"),
        F.regr_intercept(F.col(y), F.col(x)).alias("intercept"),
        F.regr_r2(F.col(y), F.col(x)).alias("r2"),
        F.regr_count(F.col(y), F.col(x)).alias("n"),
    )
