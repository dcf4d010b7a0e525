"""Solr streaming-expression & facet operator equivalents (SURVEY.md §2.6-2.9).

The reference implements these as sorted-tuple-stream decorators over
the index (`[U] solr/solrj/src/java/org/apache/solr/client/solrj/io/
stream/*.java`) with a `parallel` shuffle operator; in Spark each is a
thin declarative combinator — Catalyst supplies the shuffle, the
partial+final hash aggregation (Solr's per-shard facet + refinement),
and the join strategy selection (Solr's explicit hashJoin vs innerJoin
choice becomes broadcast-vs-sort-merge, chosen by size or forced with
a hint).

Each function documents the reference operator it mirrors; everything
stays JVM-side (no Python UDFs) so the whole layer rides whole-stage
codegen.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "select_stream", "sort_stream", "rank_stream", "unique_stream",
    "merge_stream", "intersect_stream", "complement_stream",
    "inner_join_stream", "left_outer_join_stream", "hash_join_stream",
    "cross_product_stream", "rollup_stream", "having_stream",
    "reducer_stream", "facet_field", "facet_range", "facet_query",
    "facet_pivot", "stats_component", "timeseries_stream",
    "significant_terms", "collapse", "search_after", "export_sorted",
    "join_scored", "block_join_parent", "stats_distinct", "group_top_k",
]


# ------------------------------------------------------------ tuple streams


def select_stream(df: DataFrame, *cols: Column | str) -> DataFrame:
    """`[U] .../io/stream/SelectStream.java` — project/rename/compute."""
    return df.select(*cols)


def sort_stream(df: DataFrame, *order: Column) -> DataFrame:
    """`[U] .../io/stream/SortStream.java` — full re-sort."""
    return df.orderBy(*order)


def rank_stream(df: DataFrame, n: int, *order: Column) -> DataFrame:
    """`[U] .../io/stream/RankStream.java` — top-n by sort order
    (executes as TakeOrderedAndProject: per-partition heap + merge,
    the same two-phase shape as the reference's priority queue)."""
    return df.orderBy(*order).limit(n)


def unique_stream(df: DataFrame, keys: Sequence[str], *tiebreak: Column) -> DataFrame:
    """`[U] .../io/stream/UniqueStream.java` — first tuple per key over
    a sorted stream. Deterministic version: explicit tie-break order
    via row_number (dropDuplicates is order-dependent)."""
    w = Window.partitionBy(*keys).orderBy(*tiebreak)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_stream(a: DataFrame, b: DataFrame, *order: Column) -> DataFrame:
    """`[U] .../io/stream/MergeStream.java` — sorted union of streams."""
    out = a.unionByName(b)
    return out.orderBy(*order) if order else out


def intersect_stream(a: DataFrame, b: DataFrame, on: Sequence[str]) -> DataFrame:
    """`[U] .../io/stream/IntersectStream.java` — tuples of A whose key
    appears in B (left semi)."""
    return a.join(b.select(*on).distinct(), list(on), "left_semi")


def complement_stream(a: DataFrame, b: DataFrame, on: Sequence[str]) -> DataFrame:
    """`[U] .../io/stream/ComplementStream.java` — tuples of A whose key
    does NOT appear in B (left anti)."""
    return a.join(b.select(*on).distinct(), list(on), "left_anti")


def inner_join_stream(a: DataFrame, b: DataFrame, on: Sequence[str]) -> DataFrame:
    """`[U] .../io/stream/InnerJoinStream.java` — merge equi-join of two
    streams sorted on the key; Catalyst picks sort-merge itself."""
    return a.join(b, list(on), "inner")


def left_outer_join_stream(a: DataFrame, b: DataFrame, on: Sequence[str]) -> DataFrame:
    """`[U] .../io/stream/LeftOuterJoinStream.java`."""
    return a.join(b, list(on), "left")


def hash_join_stream(a: DataFrame, small: DataFrame, on: Sequence[str],
                     how: str = "inner") -> DataFrame:
    """`[U] .../io/stream/HashJoinStream.java` — small side hashed in
    memory == Spark broadcast hash join, forced with the hint."""
    return a.join(F.broadcast(small), list(on), how)


def cartesian_product_stream(df: DataFrame, fld: str) -> DataFrame:
    """CartesianProductStream (`[U] solr/solrj/.../io/stream/
    CartesianProductStream.java`): one output tuple per value of the
    multi-valued field, the field replaced by its scalar value, every
    other column carried through. A plain explode — narrow, no
    shuffle, scales linearly with the value count."""
    return df.withColumn(fld, F.explode(F.col(fld)))


def cross_product_stream(a: DataFrame, b: DataFrame) -> DataFrame:
    """`[U] .../io/stream/CartesianProductStream.java` (⚠ name per
    SURVEY.md §2.7)."""
    return a.crossJoin(b)


def rollup_stream(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    """`[U] .../io/stream/RollupStream.java` — group-by aggregates over
    the stream. Spark's partial+final HashAggregate replaces the
    sorted-stream requirement."""
    return df.groupBy(*keys).agg(*aggs)


def having_stream(df: DataFrame, cond: Column) -> DataFrame:
    """`[U] .../io/stream/HavingStream.java` — post-aggregation filter."""
    return df.filter(cond)


def reducer_stream(df: DataFrame, keys: Sequence[str], value: str,
                   *order_within: Column) -> DataFrame:
    """`[U] .../io/stream/ReducerStream.java` — group rows into one
    tuple per key (collect values, deterministically ordered)."""
    return df.groupBy(*keys).agg(
        F.sort_array(F.collect_list(value)).alias(f"{value}s")
    )


# ----------------------------------------------------------------- facets


def facet_field(df: DataFrame, fld: str, limit: int = 100, mincount: int = 1,
                offset: int = 0, prefix: Optional[str] = None,
                sort: str = "count", missing: bool = False,
                contains: Optional[str] = None,
                exclude_terms: Sequence[str] = ()) -> DataFrame:
    """`[U] solr/core/.../request/SimpleFacets.java` + `.../search/facet/
    FacetField.java` — term facet: counts desc, index-order tiebreak,
    limit/offset/mincount. Exact by construction (Spark's shuffle
    groupBy), so the reference's distributed refinement pass
    (`FacetComponent :: refine`) has no equivalent here — SURVEY §2.6.

    Solr knobs: ``facet.prefix`` restricts buckets BEFORE counting
    (the pushdown-friendly place — the predicate reaches the scan);
    ``facet.sort=index`` orders buckets lexicographically instead of
    by count; ``facet.missing=true`` appends one NULL-valued bucket
    counting docs with no value, AFTER the ordered terms (Solr places
    the missing bucket last, outside limit/offset)."""
    vals = df.filter(F.col(fld).isNotNull())
    if prefix is not None:
        vals = vals.filter(F.col(fld).startswith(prefix))
    if contains is not None:
        # facet.contains: substring restriction on bucket values,
        # applied before counting like facet.prefix
        vals = vals.filter(F.col(fld).contains(contains))
    if exclude_terms:
        # facet.excludeTerms: named buckets dropped from the response
        vals = vals.filter(~F.col(fld).isin(list(exclude_terms)))
    order = ([F.asc(fld)] if sort == "index"
             else [F.desc("cnt"), F.asc(fld)])
    out = (
        vals.groupBy(fld).agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= mincount)
        .orderBy(*order)
    )
    if offset:
        w = Window.orderBy(*order)
        out = (out.withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") > offset).drop("__rn"))
    out = out.limit(limit)
    if missing:
        miss = (df.filter(F.col(fld).isNull())
                .agg(F.count(F.lit(1)).alias("cnt"))
                .select(F.lit(None).cast(df.schema[fld].dataType)
                        .alias(fld), "cnt"))
        out = out.unionByName(miss)
    return out


def _range_hi(start: float, gap: float, end: float, hardend: bool) -> float:
    """Actual upper bound of the last bucket: Solr's ``hardend=false``
    (default) rounds ``end`` UP to a whole gap so the final bucket keeps
    its full width; ``hardend=true`` clips it at ``end``."""
    import math

    if hardend:
        return end
    n = max(1, math.ceil((end - start) / gap - 1e-9))
    return start + n * gap


def facet_range(df: DataFrame, fld: str, start: float, gap: float,
                end: Optional[float] = None, hardend: bool = True,
                include: str = "lower") -> DataFrame:
    """`[U] .../search/facet/FacetRange.java` — numeric buckets of width
    ``gap`` from ``start``.

    ``include="lower"`` (Solr default): each bucket is
    ``[lo, lo+gap)``; ``"upper"``: ``(lo, lo+gap]``.  ``hardend``
    controls whether a ragged last bucket is clipped at ``end``
    (true) or keeps its full gap width (false, Solr's default —
    kept ``True`` here for backward compatibility of the bare call)."""
    x = F.col(fld)
    if include == "upper":
        b = F.ceil((x - F.lit(start)) / F.lit(gap)).cast("long") - F.lit(1)
        lo_ok = x > start
    elif include == "lower":
        b = F.floor((x - F.lit(start)) / F.lit(gap)).cast("long")
        lo_ok = x >= start
    else:
        raise ValueError(f"include must be lower|upper, got {include!r}")
    out = df
    if end is not None:
        hi = _range_hi(start, gap, end, hardend)
        out = out.filter((x <= hi) if include == "upper" else (x < hi))
    return (
        out.filter(lo_ok)
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("bucket_start", (F.col("bucket") * gap + start))
        .orderBy("bucket")
    )


def facet_range_other(df: DataFrame, fld: str, start: float, gap: float,
                      end: float, hardend: bool = True,
                      include: str = "lower") -> DataFrame:
    """`[U] .../search/facet/FacetRange.java :: OTHER` — the
    ``facet.range.other=all`` sections: one labeled count each for
    docs before ``start``, after the actual end, and between. One
    pass (three conditional counts), unpivoted to (label, cnt) rows."""
    x = F.col(fld)
    hi = _range_hi(start, gap, end, hardend)
    if include == "upper":
        before, after = x <= start, x > hi
        between = (x > start) & (x <= hi)
    else:
        before, after = x < start, x >= hi
        between = (x >= start) & (x < hi)
    wide = df.agg(
        F.count(F.when(before, F.lit(1))).alias("before"),
        F.count(F.when(between, F.lit(1))).alias("between"),
        F.count(F.when(after, F.lit(1))).alias("after"),
    )
    return wide.selectExpr(
        "stack(3, 'before', before, 'between', between, 'after', after) "
        "AS (label, cnt)")


def facet_query(df: DataFrame, conds: dict[str, Column]) -> DataFrame:
    """`[U] .../search/facet/FacetQuery.java` — one count per named
    predicate, single pass."""
    return df.agg(*[
        F.count(F.when(c, F.lit(1))).alias(name) for name, c in conds.items()
    ])


def facet_pivot(df: DataFrame, fields: Sequence[str], limit: int = 1000) -> DataFrame:
    """`[U] .../search/facet/FacetField.java` sub-facets / pivot —
    nested term counts == multi-column groupBy."""
    return (
        df.groupBy(*fields).agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), *[F.asc(f) for f in fields])
        .limit(limit)
    )


def facet_pivot_stats(df: DataFrame, fields: Sequence[str],
                      *stats: Column, limit: int = 1000) -> DataFrame:
    """Solr ``facet.pivot={!stats=tag}`` (`[U] solr/core/.../handler/
    component/FacetComponent.java` stats-attached pivots): nested term
    counts PLUS per-bucket stat values, one grouped aggregate — the
    refinement pass Solr needs across shards is exact by construction
    under Spark's shuffle groupBy."""
    return (
        df.groupBy(*fields).agg(F.count(F.lit(1)).alias("cnt"), *stats)
        .orderBy(F.desc("cnt"), *[F.asc(f) for f in fields])
        .limit(limit)
    )


def group_ngroups(df: DataFrame, key: str) -> DataFrame:
    """Solr ``group=true&group.ngroups=true``: total distinct group
    count next to the total match count (one partial+final agg)."""
    return df.agg(
        F.count_distinct(F.col(key)).alias("ngroups"),
        F.count(F.lit(1)).alias("matches"),
    )


def facet_range_date(df: DataFrame, fld: str, start: str, gap_days: int,
                     end: Optional[str] = None) -> DataFrame:
    """Date range facet with a calendar gap (Solr
    ``facet.range.gap=+NDAYS`` — `[U] .../search/facet/FacetRange.java`
    + ``DateMathParser``): day-granular buckets of width ``gap_days``
    from ``start``. Bucket arithmetic is integer day-diff (no decimal,
    no timezone formatting) so the result hashes stably across
    engines."""
    d = F.to_date(F.col(fld))
    lo = F.to_date(F.lit(start))
    b = F.floor(F.datediff(d, lo) / F.lit(gap_days)).cast("long")
    out = df.filter(d >= lo)
    if end is not None:
        out = out.filter(d < F.to_date(F.lit(end)))
    return (
        out.groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bucket")
    )


def stats_component(df: DataFrame, fld: str) -> DataFrame:
    """`[U] solr/core/.../handler/component/StatsComponent.java` — the
    min/max/sum/count/mean/stddev/missing bundle in one agg."""
    c = F.col(fld)
    return df.agg(
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.count(c).alias("count"),
        F.count(F.when(c.isNull(), F.lit(1))).alias("missing"),
        F.avg(c).alias("mean"),
        F.stddev_samp(c).alias("stddev"),
    )


def stats_string(df: DataFrame, fld: str) -> DataFrame:
    """StatsComponent over a STRING field (`[U] solr/core/.../handler/
    component/StatsComponent.java` — string fields report lexicographic
    min/max, count, missing and countDistinct; the numeric bundle stays
    in stats_component)."""
    c = F.col(fld)
    return df.agg(
        F.min(c).alias("min_v"),
        F.max(c).alias("max_v"),
        F.count(c).cast("long").alias("cnt"),
        F.count(F.when(c.isNull(), F.lit(1))).cast("long").alias("missing"),
        F.countDistinct(c).cast("long").alias("distinct_v"),
    )


def facet_field_stats(df: DataFrame, fld: str, *aggs: Column,
                      limit: int = 100, min_count: int = 1) -> DataFrame:
    """JSON Facet API nested aggregates (`[U] solr/core/.../search/facet/
    FacetField.java` sub-facets): a terms facet whose every bucket also
    carries stat sub-facets (``facet: {avg_x: "avg(x)"}``). One
    partial+final hash aggregate — the bucket count and all stats ride
    the same shuffle."""
    out = df.groupBy(fld).agg(F.count(F.lit(1)).alias("cnt"), *aggs)
    return (
        out.filter(F.col("cnt") >= min_count)
        .orderBy(F.desc("cnt"), F.asc(fld))
        .limit(limit)
    )


def timeseries_stream(df: DataFrame, ts: str, gap: str, *aggs: Column) -> DataFrame:
    """`[U] .../io/stream/TimeSeriesStream.java` — date-range bucketed
    aggregates; Spark window() handles the bucketing natively."""
    out = df.groupBy(F.window(F.col(ts), gap).alias("w")).agg(*aggs)
    rest = [c for c in out.columns if c != "w"]
    return out.select(F.col("w.start").alias("bucket_start"), *rest).orderBy("bucket_start")


def significant_terms(fg: DataFrame, bg: DataFrame, fld: str,
                      min_doc_freq: int = 1, limit: int = 20) -> DataFrame:
    """`[U] solr/solrj/.../io/stream/SignificantTermsStream.java` —
    foreground-vs-background term relevance: score = fg_ratio/bg_ratio."""
    wall = Window.partitionBy()
    fgc = (
        fg.groupBy(fld).agg(F.count(F.lit(1)).alias("fg_cnt"))
        .withColumn("__fg_total", F.sum("fg_cnt").over(wall))
    )
    bgc = (
        bg.groupBy(fld).agg(F.count(F.lit(1)).alias("bg_cnt"))
        .withColumn("__bg_total", F.sum("bg_cnt").over(wall))
    )
    # totals fold into the same job as the per-term counts (window over
    # the metadata-sized aggregate) — no separate fg.count()/bg.count()
    # driver actions re-scanning the inputs
    return (
        fgc.join(bgc, fld)
        .filter(F.col("fg_cnt") >= min_doc_freq)
        .withColumn(
            "score",
            (F.col("fg_cnt") / F.col("__fg_total"))
            / (F.col("bg_cnt") / F.col("__bg_total")),
        )
        .drop("__fg_total", "__bg_total")
        .orderBy(F.desc("score"), F.asc(fld))
        .limit(limit)
    )


# ----------------------------------------------------- collectors / paging


def collapse(df: DataFrame, key: str, *order: Column) -> DataFrame:
    """`[U] solr/core/.../search/CollapsingQParserPlugin.java` — best
    row per group key (field-collapsed top-k)."""
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def expand(df: DataFrame, key: str, n: int, *order: Column) -> DataFrame:
    """`[U] solr/core/.../handler/component/ExpandComponent.java` —
    the companion of :func:`collapse`: for every group that collapse
    kept a head row for, return up to ``n`` of the *other* rows of the
    group, best-first under the same ``order``. Spark shape: one window
    rank per key (same shuffle collapse used — a shared partitioning at
    scale), rows ranked 2..n+1; rank 1 IS the collapsed head and is
    excluded, exactly as the reference excludes the representative doc
    from the expanded section."""
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") >= 2) & (F.col("__rn") <= n + 1))
        .drop("__rn")
    )


def facet_interval(df: DataFrame, fld: str,
                   intervals: Sequence[tuple]) -> DataFrame:
    """`[U] solr/core/.../request/IntervalFacets.java` — facet.interval:
    one count per arbitrary (possibly overlapping, open/closed) interval
    in a single pass. ``intervals`` is ``(name, lo, hi, lo_open,
    hi_open)`` with ``None`` bounds meaning ``*`` (unbounded). Like the
    reference, a doc may land in several intervals — this is a
    conditional-count agg, not a bucketing groupBy."""
    c = F.col(fld)
    conds = {}
    for name, lo, hi, lo_open, hi_open in intervals:
        p = F.lit(True)
        if lo is not None:
            p = p & ((c > lo) if lo_open else (c >= lo))
        if hi is not None:
            p = p & ((c < hi) if hi_open else (c <= hi))
        conds[name] = p
    return df.agg(*[
        F.count(F.when(p, F.lit(1))).alias(name) for name, p in conds.items()
    ])


def facet_heatmap(df: DataFrame, lat_col: str, lon_col: str,
                  lat_min: float, lat_max: float,
                  lon_min: float, lon_max: float,
                  n_rows: int, n_cols: int) -> DataFrame:
    """`[U] solr/core/.../handler/component/SpatialHeatmapFacets.java` —
    facet.heatmap: 2D grid-cell counts of points inside a bounding box
    (the reference walks a PrefixTree at ``gridLevel``; a uniform
    ``n_rows × n_cols`` grid over the box is the equivalent flat level).
    Pure JVM floor arithmetic on two pushdown-able range filters, one
    partial+final hash agg keyed on (row, col) — no shuffle beyond the
    agg, count ∝ non-empty cells. Only non-empty cells are returned
    (the reference's counts_ints2D run-length encodes the zeros)."""
    lat, lon = F.col(lat_col), F.col(lon_col)
    cell_h = (lat_max - lat_min) / n_rows
    cell_w = (lon_max - lon_min) / n_cols
    return (
        df.filter((lat >= lat_min) & (lat < lat_max)
                  & (lon >= lon_min) & (lon < lon_max))
        .groupBy(
            F.floor((lat - F.lit(lat_min)) / F.lit(cell_h)).alias("grid_row"),
            F.floor((lon - F.lit(lon_min)) / F.lit(cell_w)).alias("grid_col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("grid_row", "grid_col")
    )


def stats_percentiles(df: DataFrame, fld: str, probs: Sequence[float],
                      approx: bool = False) -> DataFrame:
    """`[U] solr/core/.../handler/component/StatsComponent.java`
    percentiles (Solr computes them with a mergeable t-digest sketch).
    ``approx=True`` is the faithful scale path — Spark's
    ``approx_percentile`` is a mergeable sketch combined map-side, one
    pass at 10^12 rows; exact ``percentile`` (linear interpolation) is
    kept for oracle-exact verification at test scale."""
    c = F.col(fld)
    fn = "approx_percentile" if approx else "percentile"
    arr = ", ".join(repr(float(p)) for p in probs)
    pct = F.expr(f"{fn}({fld}, array({arr}))")
    return df.agg(
        F.count(c).alias("count"),
        *[pct.getItem(i).alias(f"p{int(round(p * 100)):02d}")
          for i, p in enumerate(probs)],
    )


def search_after(df: DataFrame, order: List[Column], cursor_filter: Column,
                 k: int) -> DataFrame:
    """`[U] .../search/IndexSearcher.java :: searchAfter` — deep paging:
    filter strictly past the cursor, then top-k."""
    return df.filter(cursor_filter).orderBy(*order).limit(k)


def export_sorted(df: DataFrame, *order: Column) -> DataFrame:
    """`[U] solr/core/.../handler/export/ExportWriter.java` — full
    sorted export of the result set (docvalues streaming sort)."""
    return df.orderBy(*order)


def join_scored(matched: DataFrame, to: DataFrame, from_key: str, to_key: str,
                score_col: str = "score", mode: str = "max") -> DataFrame:
    """`[U] lucene/join/.../JoinUtil.java` score modes: aggregate the
    matched docs' scores per join key (max/sum/avg/none), then semi-join
    into the `to` side carrying the aggregated score."""
    agg = {"max": F.max, "sum": F.sum, "avg": F.avg}.get(mode)
    if agg is None:  # none
        keys = matched.select(F.col(from_key).alias(to_key)).distinct()
        return to.join(keys, to_key, "left_semi")
    scored = matched.groupBy(F.col(from_key).alias(to_key)).agg(
        agg(score_col).alias("join_score")
    )
    return to.join(scored, to_key, "inner")


def block_join_parent(children: DataFrame, parents: DataFrame,
                      parent_key: str, child_cond: Column,
                      *child_aggs: Column) -> DataFrame:
    """`[U] lucene/join/.../ToParentBlockJoinQuery.java` (SURVEY §2.7):
    parents having >= 1 child matching ``child_cond``, with per-parent
    child aggregates (the ScoreMode surface: count/max/sum over matched
    children). Spark shape: filter children -> partial+final agg keyed
    on the parent -> broadcast-or-shuffle join back to parents; the
    child scan never ships non-matching rows."""
    matched = (
        children.filter(child_cond)
        .groupBy(parent_key)
        .agg(F.count(F.lit(1)).alias("n_matched"), *child_aggs)
    )
    return parents.join(matched, parent_key, "inner")


def block_join_query(text: str, parent: DataFrame, child: DataFrame,
                     parent_key: str, child_key: str) -> DataFrame:
    """``{!parent}childQuery`` / ``{!child}parentQuery`` local-params
    block-join parsers (`[U] solr/core/.../search/join/
    BlockJoinParentQParserPlugin.java` + ``BlockJoinChildQParserPlugin``):
    the text body is a Solr q over the OTHER side; the result is the
    parents having >= 1 matching child (or the children of matching
    parents). Spark shape: filter the queried side, semi-join keys —
    only ids cross the shuffle, a small filtered side broadcasts."""
    from ..functions.funcparser import parse_local_params
    from .streamparser import _q_filter

    qtype, _, body = parse_local_params(text)
    if qtype == "parent":
        keys = (_q_filter(child, body)
                .select(F.col(child_key).alias(parent_key)).distinct())
        return parent.join(keys, parent_key, "left_semi")
    if qtype == "child":
        keys = (_q_filter(parent, body)
                .select(F.col(parent_key).alias(child_key)).distinct())
        return child.join(keys, child_key, "left_semi")
    raise ValueError(f"unsupported block-join local-params {qtype!r}")


def child_transformer(parents: DataFrame, children: DataFrame,
                      parent_key: str, child_key: str,
                      child_fl: Sequence[str], limit: int = 10,
                      order: Optional[Column] = None) -> DataFrame:
    """Solr ``fl=*,[child limit=N]`` doc transformer (`[U] solr/core/
    .../response/transform/ChildDocTransformerFactory.java`): each
    returned parent carries an array of its first ``limit`` child docs
    (selected fields only). Spark shape: rank children per parent with
    a window, aggregate the capped set to an array of structs, LEFT
    join onto parents — children never fan the parent rows out."""
    from pyspark.sql import Window

    w = Window.partitionBy(child_key).orderBy(
        order if order is not None else F.asc(child_fl[0]))
    capped = (
        children.select(child_key, *child_fl)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= limit)
    )
    packed = (
        capped.groupBy(child_key)
        .agg(F.sort_array(F.collect_list(
            F.struct(F.col("__rn").alias("_rank"), *child_fl))).alias("_docs"))
        .select(F.col(child_key).alias(parent_key),
                F.col("_docs").alias("child_docs"))
    )
    return parents.join(packed, parent_key, "left")


def stats_distinct(df: DataFrame, fld: str, approx: bool = False) -> DataFrame:
    """`[U] solr/core/.../search/facet/HLLAgg.java` / ``unique`` agg:
    cardinality of a field. ``approx=True`` uses HyperLogLog++
    (approx_count_distinct — one pass, mergeable sketches, the only
    option at 10^12 rows); exact uses count_distinct."""
    agg = (F.approx_count_distinct(fld) if approx else F.count_distinct(F.col(fld)))
    return df.agg(agg.alias("distinct_count"))


def group_top_k(df: DataFrame, key: str, n: int, *order: Column) -> DataFrame:
    """Result grouping (`[U] lucene/grouping/` / Solr group=true): the
    top ``n`` rows per ``key`` — generalizes collapse() from 1 to n."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .withColumnRenamed("_rn", "group_rank")
    )
