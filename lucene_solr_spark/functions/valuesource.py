"""Function-query (ValueSource) library — SURVEY.md §2.10.

Reference: `[U] solr/core/.../search/ValueSourceParser.java` (registry),
`[U] lucene/queries/.../function/valuesource/*.java`. Most entries map
1:1 onto ``pyspark.sql.functions`` (abs/add/sub/mul/div/pow/sqrt/log/
trig/ceil/floor → same names; min/max → least/greatest; if/exists/def →
when/coalesce/isnotnull); below are the ones with actual logic, each a
Column-in/Column-out combinator so Catalyst folds them into codegen.

Index-coupled sources (termfreq/docfreq/idf/norm) live on IndexReader
(they read the postings/docmeta tables).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "map_fn", "scale_fn", "recip", "linear", "haversine_km", "geodist",
    "ms", "strdist_levenshtein", "ord_fn", "rord_fn", "boost_product",
    "bbox_from_point", "bbox_predicate", "delimited_payloads",
    "payload_fn",
]

#: Solr's mean earth radius, km (DistanceUtils.EARTH_MEAN_RADIUS_KM)
EARTH_RADIUS_KM = 6371.0087714


def map_fn(x: Column, lo: float, hi: float, target: float,
           default: Column | None = None) -> Column:
    """map(x, min, max, target[, default]): x in [min, max] -> target,
    else default (or x). `[U] .../function/valuesource/RangeMapFloatFunction.java`."""
    fallback = default if default is not None else x
    return F.when((x >= lo) & (x <= hi), F.lit(target)).otherwise(fallback)


def scale_fn(df: DataFrame, x: Column, lo: float, hi: float) -> Column:
    """scale(x, lo, hi): min-max rescale into [lo, hi]. The reference
    computes the field's global min/max per searcher
    (`[U] .../valuesource/ScaleFloatFunction.java`); here an analytic
    window over the whole frame does it in one pass (no driver collect).
    Returns a column valid on ``df``."""
    w = Window.partitionBy()
    xmin, xmax = F.min(x).over(w), F.max(x).over(w)
    span = xmax - xmin
    return F.when(span == 0, F.lit(lo)).otherwise(
        (x - xmin) / span * (hi - lo) + F.lit(lo)
    )


def recip(x: Column, m: float, a: float, b: float) -> Column:
    """recip(x,m,a,b) = a / (m*x + b) — the classic age-decay boost
    (`[U] .../valuesource/ReciprocalFloatFunction.java`)."""
    return F.lit(a) / (F.lit(m) * x + F.lit(b))


def linear(x: Column, m: float, c: float) -> Column:
    return F.lit(m) * x + F.lit(c)


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (`[U] .../valuesource/
    HaversineFunction.java`; Solr ``geodist``/``hsin``)."""
    r = EARTH_RADIUS_KM
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1)
    dl = F.radians(lon2 - lon1)
    a = F.sin(dp / 2) ** 2 + F.cos(p1) * F.cos(p2) * F.sin(dl / 2) ** 2
    return F.lit(2 * r) * F.asin(F.sqrt(a))


geodist = haversine_km


def delimited_payloads(text: Column, term: str, delimiter: str = "|") -> Column:
    """``array<double>`` of the payloads attached to ``term``'s
    occurrences in a whitespace-separated delimited-payload field
    ("big|0.5 data|1.0 ..."), in occurrence order — the float-decoder
    DelimitedPayloadTokenFilter read path (`[U] lucene/analysis/common/
    .../payloads/DelimitedPayloadTokenFilter.java`). Pure higher-order
    column functions (filter/transform), so the whole decode stays
    inside whole-stage codegen — no UDF, no shuffle."""
    toks = F.filter(F.split(text, " "), lambda t: t != F.lit(""))
    # a token without the delimiter carries NO payload attribute and
    # contributes nothing (DelimitedPayloadTokenFilter leaves the
    # attribute unset) — require the delimiter so a bare `term` token
    # can't inject a NULL into the payload stream
    hits = F.filter(
        toks, lambda t: (F.substring_index(t, delimiter, 1) == F.lit(term))
        & t.contains(delimiter))
    return F.transform(
        hits, lambda t: F.substring_index(t, delimiter, -1).cast("double"))


def payload_fn(text: Column, term: str, func: str = "average",
               default: float = 0.0, delimiter: str = "|") -> Column:
    """``payload(field, term[, default[, func]])`` — per-doc aggregate
    of the term's occurrence payloads; ``default`` when the term is
    absent (`[U] solr/core/.../search/ValueSourceParser.java ::
    "payload"` -> FloatPayloadValueSource; func per `[U] lucene/queries/
    .../payloads/PayloadFunction.java` subclasses: min/max/average plus
    Solr's first). Computed in double — Lucene's float32 stream is
    bit-identical for payloads below 2**24 with exact binary fractions,
    the delimited-payload norm."""
    pays = delimited_payloads(text, term, delimiter)
    n = F.size(pays)
    if func == "first":
        v = F.element_at(pays, 1)
    elif func == "min":
        v = F.array_min(pays)
    elif func == "max":
        v = F.array_max(pays)
    elif func == "average":
        v = F.aggregate(pays, F.lit(0.0), lambda a, x: a + x) / n
    else:
        raise ValueError(f"unknown payload func {func!r}")
    return F.when(n > 0, v).otherwise(F.lit(float(default)))


def bbox_from_point(lat: float, lon: float, d_km: float):
    """(lat_min, lat_max, lon_min, lon_max) of the smallest lat/lon
    rectangle containing the ``d_km`` circle around the point — the box
    Solr's ``{!bbox}`` filters by (`[U] solr/core/.../search/
    SpatialFilterQParser.java` via spatial4j
    ``DistanceUtils.calcBoxByDistFromPtDEG``). Computed ONCE at query
    build time (pure Python floats), exactly like the reference: the
    per-row filter is then plain range predicates.

    Pole crossing widens longitude to the full band; antimeridian
    crossing is reported by lon_min > lon_max (caller ORs two ranges).
    """
    r = d_km / EARTH_RADIUS_KM
    dlat = math.degrees(r)
    lat_min, lat_max = lat - dlat, lat + dlat
    if lat_min <= -90.0 or lat_max >= 90.0:
        return (max(lat_min, -90.0), min(lat_max, 90.0), -180.0, 180.0)
    dlon = math.degrees(math.asin(math.sin(r) / math.cos(math.radians(lat))))
    lon_min, lon_max = lon - dlon, lon + dlon
    if lon_min < -180.0:
        lon_min += 360.0          # wraps: lon_min > lon_max signals OR
    if lon_max > 180.0:
        lon_max -= 360.0
    return (lat_min, lat_max, lon_min, lon_max)


def bbox_predicate(lat_col: Column, lon_col: Column,
                   lat: float, lon: float, d_km: float) -> Column:
    """Solr ``{!bbox sfield=.. pt=lat,lon d=km}``: rectangle-only
    containment test (no per-row trig — cheaper than geofilt, may admit
    corner docs past ``d_km``, exactly as the reference documents). All
    comparisons are literal range predicates, so Catalyst pushes them
    into the scan (PushedFilters on lat/lon columns)."""
    lat_min, lat_max, lon_min, lon_max = bbox_from_point(lat, lon, d_km)
    p = (lat_col >= lat_min) & (lat_col <= lat_max)
    if lon_min <= lon_max:
        return p & (lon_col >= lon_min) & (lon_col <= lon_max)
    return p & ((lon_col >= lon_min) | (lon_col <= lon_max))


def ms(ts1: Column, ts2: Column) -> Column:
    """ms(a,b): milliseconds between two timestamps
    (`[U] .../valuesource/DateDifferenceFunction.java` semantics)."""
    return (F.unix_micros(ts1.cast("timestamp")) - F.unix_micros(ts2.cast("timestamp"))) / 1000


def strdist_levenshtein(a: Column, b: Column) -> Column:
    """strdist(a, b, edit): similarity in [0,1] = 1 - dist/maxlen
    (`[U] .../util/distance/LevensteinDistance.java` ⚠ upstream class
    name has the historical spelling)."""
    ml = F.greatest(F.length(a), F.length(b))
    return F.when(ml == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b) / ml
    )


def ord_fn(x: Column) -> Column:
    """ord(field): 1-based position of the value in the field's sorted
    unique order (`[U] .../valuesource/OrdFieldSource.java`)."""
    return F.dense_rank().over(Window.partitionBy().orderBy(x.asc()))


def rord_fn(x: Column) -> Column:
    return F.dense_rank().over(Window.partitionBy().orderBy(x.desc()))


def boost_product(score: Column, *boosts: Column) -> Column:
    """boost(q, f): multiply a score column by function values
    (`[U] solr/core/.../search/BoostQParserPlugin.java`)."""
    out = score
    for b in boosts:
        out = out * b
    return out
