"""JSON Facet API — the request-shaped front door (SURVEY §2.6).

Solr's JSON Facet API (`[U] solr/core/src/java/org/apache/solr/search/
facet/FacetRequest.java`, ``FacetField``/``FacetQuery``/``FacetRange``)
takes a nested JSON spec: terms/query/range facets, per-bucket stat
facets (``"avg_len": "avg(len)"``) and nested sub-facets. The
combinators already exist in ``streamexpr.py``; this module parses the
spec shape and composes them, flattening each nested terms path into
one grouped aggregate so Catalyst plans a single partial+final
HashAggregate per facet instead of a bucket-at-a-time recursion.

Spec subset (per facet name):

    {"type": "terms", "field": f, "limit": n, "mincount": m,
     "offset": o, "prefix": p, "missing": true, "allBuckets": true,
     "numBuckets": true, "sort": "count desc"|"index asc"|"<stat> desc",
     "domain": {"filter": <SQL string or Column>},
     "facet": {statname: "sum(x)"|"avg(x)"|"min(x)"|"max(x)"|
               "unique(x)"|"count(*)",
               subname: {"type": "terms", ...}}}
    {"type": "query", "q": <Column or SQL string>}
    {"type": "range", "field": f, "start": a, "end": b, "gap": g}

Knob semantics follow `[U] solr/core/.../search/facet/FacetField.java`:
``sort`` names ``count``, ``index``, or any sibling stat facet;
``allBuckets`` emits one extra frame (``name:allBuckets``) aggregating
ALL matching docs into a single bucket (unaffected by limit/mincount);
``numBuckets`` emits ``name:numBuckets`` with the pre-limit bucket
count; ``domain.filter`` swaps the facet's base domain before
bucketing — all computed as plain Spark aggregates so each extra
frame is one partial+final HashAggregate, no recursion.

Stat strings are parsed by the function-query parser where arithmetic
is involved (``"avg(len(text))"`` works), so the two Solr text surfaces
compose.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["json_facet", "JsonFacetError"]


class JsonFacetError(ValueError):
    pass


_STAT_RE = re.compile(r"^(count|sum|avg|min|max|unique)\((.*)\)$")
_STATS = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
          "unique": F.count_distinct}


def _stat_col(name: str, expr: str) -> Column:
    m = _STAT_RE.match(expr.strip())
    if not m:
        raise JsonFacetError(f"unsupported stat {expr!r}")
    fn, arg = m.group(1), m.group(2).strip()
    if fn == "count":
        return F.count(F.lit(1)).alias(name)
    if arg == "":
        raise JsonFacetError(f"{fn}() needs an argument")
    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", arg):
        col: Column = F.col(arg)
    else:
        from ..functions.funcparser import parse_function_query

        col = parse_function_query(arg)
    return _STATS[fn](col).alias(name)


def _split(spec: Dict) -> Tuple[List[Tuple[str, str]], List[Tuple[str, Dict]]]:
    """sub-facet dict -> (stat facets, nested facets)."""
    stats, nested = [], []
    for name, sub in (spec or {}).items():
        if isinstance(sub, str):
            stats.append((name, sub))
        elif isinstance(sub, dict):
            nested.append((name, sub))
        else:
            raise JsonFacetError(f"bad sub-facet {name!r}")
    return stats, nested


def _sort_order(sort: str, stats: List[Tuple[str, str]],
                keys: List[str]) -> List[Column]:
    """``"count desc"`` / ``"index asc"`` / ``"<stat> desc"`` -> order
    columns, with index-order (then-key) tiebreak as Solr documents."""
    parts = sort.strip().split()
    fld, direction = parts[0], (parts[1] if len(parts) > 1 else "desc")
    if direction not in ("asc", "desc"):
        raise JsonFacetError(f"bad sort direction {direction!r}")
    tiebreak = [F.asc(k) for k in keys]
    if fld == "index":
        return ([F.asc(k) for k in keys] if direction == "asc"
                else [F.desc(k) for k in keys])
    if fld == "count":
        lead = F.desc("cnt") if direction == "desc" else F.asc("cnt")
        return [lead] + tiebreak
    if fld not in {n for n, _ in stats}:
        raise JsonFacetError(f"sort names unknown stat {fld!r}")
    lead = F.desc(fld) if direction == "desc" else F.asc(fld)
    return [lead] + tiebreak


def _terms(df: DataFrame, spec: Dict, path: List[str]) -> Dict[str, DataFrame]:
    fld = spec["field"]
    limit = int(spec.get("limit", 100))
    mincount = int(spec.get("mincount", 1))
    offset = int(spec.get("offset", 0))
    prefix = spec.get("prefix")
    stats, nested = _split(spec.get("facet"))
    keys = path + [fld]
    base = df.filter(F.col(fld).isNotNull())
    if prefix is not None:
        base = base.filter(F.col(fld).startswith(str(prefix)))
    aggs = [F.count(F.lit(1)).alias("cnt")]
    aggs += [_stat_col(n, s) for n, s in stats]
    order = _sort_order(str(spec.get("sort", "count desc")), stats, keys)
    buckets = (
        base.groupBy(*keys).agg(*aggs)
        .filter(F.col("cnt") >= mincount)
    )
    out = buckets.orderBy(*order)
    if offset and not path:
        from pyspark.sql.window import Window

        w = Window.orderBy(*order)
        out = (out.withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") > offset).drop("__rn"))
    out = out.limit(limit if not path else (1 << 30))
    if spec.get("missing") and not path:
        miss = (df.filter(F.col(fld).isNull()).agg(*aggs)
                .select(F.lit(None).cast(df.schema[fld].dataType)
                        .alias(fld), "cnt",
                        *[n for n, _ in stats]))
        out = out.unionByName(miss)
    res = {"/".join(keys): out}
    if spec.get("allBuckets") and not path:
        res["/".join(keys) + ":allBuckets"] = base.agg(*aggs)
    if spec.get("numBuckets") and not path:
        res["/".join(keys) + ":numBuckets"] = (
            buckets.agg(F.count(F.lit(1)).alias("numBuckets")))
    for name, sub in nested:
        if sub.get("type", "terms") != "terms":
            raise JsonFacetError("nested sub-facets support terms only")
        res.update(_terms(df, sub, keys))
    return res


def json_facet(df: DataFrame, request: Dict) -> Dict[str, DataFrame]:
    """Evaluate a JSON Facet API request against ``df``.

    Returns one DataFrame per facet path: a terms facet yields
    ``(field..., cnt, <stats...>)`` rows ordered count-desc; nested
    terms yield one frame per nesting level keyed by the full path."""
    out: Dict[str, DataFrame] = {}
    for name, spec in request.items():
        ftype = spec.get("type", "terms")
        dom = spec.get("domain") or {}
        base = df
        if "filter" in dom:
            fq = dom["filter"]
            base = df.filter(F.expr(fq) if isinstance(fq, str) else fq)
        if "blockChildren" in dom:
            # Solr `domain: {blockChildren: "..."}": switch the facet
            # domain from the matched PARENTS to their child docs
            # (`[U] solr/core/.../search/facet/FacetRequest.java` +
            # `join/BlockJoinChildQuery`). Nested docs live in one
            # Lucene segment; the relational equivalent is a child
            # table semi-joined to the current domain's parent keys —
            # ids only move, and a small parent set broadcasts.
            bc = dom["blockChildren"]
            keys = base.select(
                F.col(bc["parent_key"]).alias(bc["child_key"])).distinct()
            base = bc["child"].join(keys, bc["child_key"], "left_semi")
        if "blockParent" in dom:
            bp = dom["blockParent"]
            keys = base.select(
                F.col(bp["child_key"]).alias(bp["parent_key"])).distinct()
            base = bp["parent"].join(keys, bp["parent_key"], "left_semi")
        if ftype == "terms":
            frames = _terms(base, spec, [])
            # top-level frame keeps the user's facet name
            first = "/".join([spec["field"]])
            for path, frame in frames.items():
                if path == first:
                    out[name] = frame
                elif path.startswith(first + ":"):
                    # allBuckets / numBuckets companions of the top level
                    out[f"{name}:{path.split(':', 1)[1]}"] = frame
                else:
                    out[f"{name}:{path}"] = frame
        elif ftype == "query":
            q = spec["q"]
            cond = F.expr(q) if isinstance(q, str) else q
            out[name] = base.agg(
                F.count(F.when(cond, F.lit(1))).alias("cnt"))
        elif ftype == "range":
            from . import streamexpr as sx

            out[name] = sx.facet_range(
                base, spec["field"], float(spec["start"]), float(spec["gap"]),
            )
        else:
            raise JsonFacetError(f"unknown facet type {ftype!r}")
    return out
