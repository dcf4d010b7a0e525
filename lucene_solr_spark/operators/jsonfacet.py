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
     "facet": {statname: "sum(x)"|"avg(x)"|"min(x)"|"max(x)"|
               "unique(x)"|"count(*)",
               subname: {"type": "terms", ...}}}
    {"type": "query", "q": <Column or SQL string>}
    {"type": "range", "field": f, "start": a, "end": b, "gap": g}

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


def _terms(df: DataFrame, spec: Dict, path: List[str]) -> Dict[str, DataFrame]:
    fld = spec["field"]
    limit = int(spec.get("limit", 100))
    mincount = int(spec.get("mincount", 1))
    stats, nested = _split(spec.get("facet"))
    keys = path + [fld]
    aggs = [F.count(F.lit(1)).alias("cnt")]
    aggs += [_stat_col(n, s) for n, s in stats]
    out = (
        df.groupBy(*keys).agg(*aggs)
        .filter(F.col("cnt") >= mincount)
        .orderBy(*([F.desc("cnt")] + [F.asc(k) for k in keys]))
        .limit(limit if not path else (1 << 30))
    )
    res = {"/".join(keys): out}
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
        if ftype == "terms":
            frames = _terms(df, spec, [])
            # top-level frame keeps the user's facet name
            first = "/".join([spec["field"]])
            for path, frame in frames.items():
                out[name if path == first else f"{name}:{path}"] = frame
        elif ftype == "query":
            q = spec["q"]
            cond = F.expr(q) if isinstance(q, str) else q
            out[name] = df.agg(
                F.count(F.when(cond, F.lit(1))).alias("cnt"))
        elif ftype == "range":
            from . import streamexpr as sx

            out[name] = sx.facet_range(
                df, spec["field"], float(spec["start"]), float(spec["gap"]),
            )
        else:
            raise JsonFacetError(f"unknown facet type {ftype!r}")
    return out
