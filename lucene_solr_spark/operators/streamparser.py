"""Streaming-expression STRING parser — the text form of SURVEY §2.8-2.9.

Solr users compose streaming expressions as text
(`[U] solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/expr/
StreamExpressionParser.java` + StreamFactory's registry); the operators
themselves already exist in ``operators/streamexpr.py`` as DataFrame
combinators. This is the missing front door: parse the text, resolve
source names against a table registry, map each function onto the
existing combinator, return the composed (lazy) DataFrame — Catalyst
then optimizes the WHOLE expression as one plan (filter pushdown
through the composition, partial aggs, broadcast joins), which the
reference's tuple-at-a-time decorator stack cannot do.

Grammar::

    expr    := name '(' operand (',' operand)* ')'
    operand := expr                  (inner stream / aggregate)
             | name '=' value        (named parameter)
             | value                 (positional parameter)
    value   := "..." | bare-token (no commas/parens/whitespace)

Supported functions (each resolves to its streamexpr combinator):
search, select, sort, top, unique, merge, intersect, complement,
innerJoin, leftOuterJoin, hashJoin, rollup, having, facet,
timeseries (gap="+1DAY" date-range buckets, optional start/end in Solr
date-math), parallel (workers=N [, partitionKeys=...] — an EXPLICIT
repartition: Spark already executes every stage data-parallel, so
Solr's worker-collection fan-out degenerates to a shuffle hint),
daemon (batch face: one run of the wrapped expression — the recurring
face is streaming.daemon_counts), topic (batch face: the matching
rows; the checkpointed at-least-once face is streaming.topic_stream).
Aggregate operands: count(*), sum(f), avg(f), min(f), max(f).
Boolean operands (having): gt/lt/eq(field, value), and(a, b), or(a, b),
not(a).

``search(tbl, q="l_quantity:[45 TO *]", fl="a,b", sort="a asc")``
resolves ``tbl`` through the registry; ``q`` supports ``*:*``,
``field:value`` equality and ``field:[lo TO hi]`` ranges over table
columns (the relational face of Solr's query param — full-text q
against an index goes through IndexReader/solr_select instead).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Dict, List, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import streamexpr as sx

__all__ = ["parse_stream_expr", "StreamExprError"]


class StreamExprError(ValueError):
    pass


# ------------------------------------------------------------------ lexer

_TOK = re.compile(r'\s*(?:(?P<str>"[^"]*")|(?P<punc>[(),=])|(?P<bare>[^\s(),=]+))')


def _lex(text: str) -> List[tuple]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOK.match(text, pos)
        if not m:
            break
        if m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1]))
        elif m.group("punc") is not None:
            out.append(("punc", m.group("punc")))
        else:
            out.append(("bare", m.group("bare")))
        pos = m.end()
    if text[pos:].strip():
        raise StreamExprError(f"bad token at {text[pos:]!r}")
    out.append(("eof", None))
    return out


# ------------------------------------------------------------------ parser

@dataclass
class Call:
    name: str
    args: List["Operand"]


@dataclass
class Param:
    name: str
    value: Union[str, "Call"]


Operand = Union[Call, Param, str]


class _P:
    def __init__(self, text: str):
        self.t = _lex(text)
        self.i = 0

    def peek(self):
        return self.t[self.i]

    def next(self):
        tok = self.t[self.i]
        self.i += 1
        return tok

    def expect(self, v):
        k, got = self.next()
        if k != "punc" or got != v:
            raise StreamExprError(f"expected {v!r}, got {got!r}")

    def parse(self) -> Call:
        node = self.operand()
        if not isinstance(node, Call):
            raise StreamExprError("top level must be a function call")
        if self.peek()[0] != "eof":
            raise StreamExprError(f"trailing input: {self.t[self.i:]}")
        return node

    def operand(self) -> Operand:
        kind, v = self.next()
        if kind == "str":
            return v
        if kind != "bare":
            raise StreamExprError(f"unexpected {v!r}")
        nxt = self.peek()
        if nxt == ("punc", "("):
            self.next()
            args: List[Operand] = []
            if self.peek() != ("punc", ")"):
                args.append(self.operand())
                while self.peek() == ("punc", ","):
                    self.next()
                    args.append(self.operand())
            self.expect(")")
            return Call(v, args)
        if nxt == ("punc", "="):
            self.next()
            k, val = self.next()
            if k == "bare" and self.peek() == ("punc", "("):
                self.next()
                args = []
                if self.peek() != ("punc", ")"):
                    args.append(self.operand())
                    while self.peek() == ("punc", ","):
                        self.next()
                        args.append(self.operand())
                self.expect(")")
                return Param(v, Call(val, args))
            if k not in ("bare", "str"):
                raise StreamExprError(f"bad value for {v}=")
            return Param(v, val)
        return v


# ------------------------------------------------------------- evaluation

_AGGS = {"count", "sum", "avg", "min", "max"}
_BOOLS = {"gt", "lt", "eq", "and", "or", "not"}


def _agg_col(c: Call) -> Column:
    a = c.args[0] if c.args else "*"
    fld = a if isinstance(a, str) else None
    if c.name == "count":
        return F.count(F.lit(1)).alias("count(*)")
    fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[c.name]
    return fn(fld).alias(f"{c.name}({fld})")


def _bool_col(c: Call) -> Column:
    def leaf(x):
        if isinstance(x, Call):
            if x.name in _AGGS:  # refer to an agg OUTPUT column by name
                a = x.args[0] if x.args else "*"
                return F.col(f"{x.name}({a if isinstance(a, str) else '*'})")
            return _bool_col(x)
        try:
            return F.lit(float(x)) if "." in x else F.lit(int(x))
        except ValueError:
            return F.col(x)

    if c.name == "and":
        return leaf(c.args[0]) & leaf(c.args[1])
    if c.name == "or":
        return leaf(c.args[0]) | leaf(c.args[1])
    if c.name == "not":
        return ~leaf(c.args[0])
    a, b = leaf(c.args[0]), leaf(c.args[1])
    return {"gt": a > b, "lt": a < b, "eq": a == b}[c.name]


_RANGE = re.compile(r"^(\w+):\[([^ ]+) TO ([^ \]]+)\]$")
_EQ = re.compile(r"^(\w+):([^\[].*)$")


def _q_filter(df: DataFrame, q: str) -> DataFrame:
    q = q.strip()
    if q in ("*:*", ""):
        return df
    m = _RANGE.match(q)
    if m:
        fld, lo, hi = m.groups()
        out = df
        if lo != "*":
            out = out.filter(F.col(fld) >= lo)
        if hi != "*":
            out = out.filter(F.col(fld) <= hi)
        return out
    m = _EQ.match(q)
    if m:
        return df.filter(F.col(m.group(1)) == m.group(2))
    raise StreamExprError(f"unsupported q syntax {q!r}")


def join_query(text: str, from_df: DataFrame, to_df: DataFrame) -> DataFrame:
    """``{!join from=F to=T}body`` (`[U] solr/core/.../search/
    JoinQParserPlugin.java`, default ScoreMode.None — JoinUtil's none
    mode): to-side docs whose T value appears among the F values of
    from-side docs matching the body query. Distinct join keys then a
    left-semi join — Catalyst broadcasts the key set when small, so
    the big to-side never shuffles."""
    from ..functions.funcparser import parse_local_params

    qtype, lp, body = parse_local_params(text)
    if qtype != "join":
        raise StreamExprError(f"not a {{!join}} query: {text!r}")
    matched = _q_filter(from_df, body or "*:*")
    return sx.join_scored(matched, to_df, lp["from"], lp["to"], mode="none")


def _sort_cols(spec: str) -> List[Column]:
    cols = []
    for part in spec.split(","):
        bits = part.split()
        fld = bits[0]
        desc = len(bits) > 1 and bits[1].lower() == "desc"
        cols.append(F.desc(fld) if desc else F.asc(fld))
    return cols


def _params(call: Call) -> Dict[str, Union[str, Call]]:
    return {a.name: a.value for a in call.args if isinstance(a, Param)}


def _streams(call: Call, env) -> List[DataFrame]:
    return [_eval(a, env) for a in call.args
            if isinstance(a, Call) and a.name not in _AGGS | _BOOLS]


def _aggs(call: Call) -> List[Column]:
    return [_agg_col(a) for a in call.args
            if isinstance(a, Call) and a.name in _AGGS]


def _eval(c: Call, env: Dict[str, DataFrame]) -> DataFrame:
    p = _params(c)
    inner = _streams(c, env)
    n = c.name

    if n == "search":
        src = c.args[0]
        if not isinstance(src, str) or src not in env:
            raise StreamExprError(f"unknown collection {src!r}")
        df = _q_filter(env[src], str(p.get("q", "*:*")))
        if "fl" in p:
            df = df.select(*[f.strip() for f in str(p["fl"]).split(",")])
        if "sort" in p:
            df = df.orderBy(*_sort_cols(str(p["sort"])))
        return df
    if n == "select":
        fields = [a for a in c.args[1:] if isinstance(a, str)]
        renames = [(a.name, a.value) for a in c.args[1:]
                   if isinstance(a, Param) and isinstance(a.value, str)]
        cols = [F.col(f) for f in fields]
        cols += [F.col(src).alias(dst) for src, dst in renames]
        return sx.select_stream(inner[0], *cols)
    if n == "sort":
        return sx.sort_stream(inner[0], *_sort_cols(str(p["by"])))
    if n == "top":
        return sx.rank_stream(inner[0], int(str(p["n"])),
                              *_sort_cols(str(p["sort"])))
    if n == "unique":
        keys = [f.strip() for f in str(p["over"]).split(",")]
        # Solr's UniqueStream takes the FIRST tuple of the incoming
        # sorted stream; deterministic default here: all columns asc
        return sx.unique_stream(inner[0], keys,
                                *[F.asc(col) for col in inner[0].columns])
    if n == "merge":
        return sx.merge_stream(inner[0], inner[1])
    if n == "intersect":
        return sx.intersect_stream(inner[0], inner[1],
                                   [f.strip() for f in str(p["on"]).split(",")])
    if n == "complement":
        return sx.complement_stream(inner[0], inner[1],
                                    [f.strip() for f in str(p["on"]).split(",")])
    if n == "innerJoin":
        return sx.inner_join_stream(inner[0], inner[1],
                                    [f.strip() for f in str(p["on"]).split(",")])
    if n == "leftOuterJoin":
        return sx.left_outer_join_stream(
            inner[0], inner[1], [f.strip() for f in str(p["on"]).split(",")])
    if n == "hashJoin":
        return sx.hash_join_stream(
            inner[0], inner[1], [f.strip() for f in str(p["on"]).split(",")])
    if n == "cartesianProduct":
        # cartesianProduct(stream, field): one tuple per value of the
        # multi-valued field (`[U] solr/solrj/.../io/stream/
        # CartesianProductStream.java`)
        flds = [a for a in c.args[1:] if isinstance(a, str)]
        if not flds:
            raise StreamExprError("cartesianProduct() needs a field")
        return sx.cartesian_product_stream(inner[0], flds[0])
    if n == "rollup":
        keys = [f.strip() for f in str(p["over"]).split(",")]
        return sx.rollup_stream(inner[0], keys, *_aggs(c))
    if n == "having":
        conds = [a for a in c.args if isinstance(a, Call) and a.name in _BOOLS]
        if not conds:
            raise StreamExprError("having() needs a boolean operand")
        return sx.having_stream(inner[0], _bool_col(conds[0]))
    if n == "facet":
        src = c.args[0]
        if not isinstance(src, str) or src not in env:
            raise StreamExprError(f"unknown collection {src!r}")
        df = _q_filter(env[src], str(p.get("q", "*:*")))
        return sx.facet_field(df, str(p["buckets"]),
                              limit=int(str(p.get("limit", 100))))
    if n == "timeseries":
        src = c.args[0]
        if not isinstance(src, str) or src not in env:
            raise StreamExprError(f"unknown collection {src!r}")
        df = _q_filter(env[src], str(p.get("q", "*:*")))
        fld = str(p["field"])
        for bound, op in (("start", "__ge__"), ("end", "__lt__")):
            if bound in p:
                from ..functions.datemath import parse_date_math

                lit = F.lit(parse_date_math(str(p[bound])).isoformat(sep=" ")
                            ).cast(df.schema[fld].dataType)
                df = df.filter(getattr(F.col(fld), op)(lit))
        aggs = _aggs(c) or [F.count(F.lit(1)).alias("count(*)")]
        return sx.timeseries_stream(df, fld, _gap_interval(str(p["gap"])), *aggs)
    if n == "fetch":
        # fetch(collection, stream, on="streamField=collectionField",
        #       fl="a,b") — batch-enrich the stream with stored fields
        # (`[U] solr/solrj/.../io/stream/FetchStream.java`): a LEFT
        # join shipping only the fl columns of the fetch side
        src = c.args[0]
        if not isinstance(src, str) or src not in env:
            raise StreamExprError(f"unknown collection {src!r}")
        on = str(p["on"])
        lkey, rkey = ([s.strip() for s in on.split("=", 1)]
                      if "=" in on else (on.strip(), on.strip()))
        fl = [f.strip() for f in str(p["fl"]).split(",")]
        right = env[src].select(F.col(rkey).alias(lkey), *fl)
        return inner[0].join(right, lkey, "left")
    if n == "significantTerms":
        # significantTerms(collection, q=..., field=..., limit=...) —
        # foreground (q matches) vs background (whole collection)
        src = c.args[0]
        if not isinstance(src, str) or src not in env:
            raise StreamExprError(f"unknown collection {src!r}")
        fg = _q_filter(env[src], str(p.get("q", "*:*")))
        return sx.significant_terms(fg, env[src], str(p["field"]),
                                    limit=int(str(p.get("limit", 20))))
    if n == "nodes":
        # nodes(edgesCollection, <seed stream>, walk="a->b") — one-hop
        # (or hops=N) gatherNodes over the edge table
        src = c.args[0]
        if not isinstance(src, str) or src not in env:
            raise StreamExprError(f"unknown collection {src!r}")
        from .graph import gather_nodes

        walk = str(p["walk"])
        if "->" not in walk:
            raise StreamExprError(f"walk must be 'from->to', got {walk!r}")
        frm, to = [s.strip() for s in walk.split("->", 1)]
        return gather_nodes(env[src], inner[0], frm, to,
                            hops=int(str(p.get("hops", 1))))
    if n == "stats":
        src = c.args[0]
        if not isinstance(src, str) or src not in env:
            raise StreamExprError(f"unknown collection {src!r}")
        df = _q_filter(env[src], str(p.get("q", "*:*")))
        aggs = _aggs(c)
        if not aggs:
            raise StreamExprError("stats() needs at least one metric")
        return df.agg(*aggs)
    if n == "parallel":
        workers = int(str(p.get("workers", "0")))
        keys = ([f.strip() for f in str(p["partitionKeys"]).split(",")]
                if "partitionKeys" in p else [])
        df = inner[0]
        if workers:
            df = df.repartition(workers, *[F.col(k) for k in keys]) \
                if keys else df.repartition(workers)
        return df
    if n == "daemon":
        # batch face of DaemonStream: evaluate the wrapped expression
        # once; scheduling/recurrence belongs to the streaming module
        return inner[0]
    if n == "topic":
        src = c.args[0]
        if not isinstance(src, str) or src not in env:
            raise StreamExprError(f"unknown collection {src!r}")
        return _q_filter(env[src], str(p.get("q", "*:*")))
    raise StreamExprError(f"unknown stream function {n!r}")


_GAP = re.compile(r"^\+?(\d+)(DAY|HOUR|MINUTE|SECOND)S?$", re.I)


def _gap_interval(gap: str) -> str:
    """Solr timeseries gap ('+1DAY') -> Spark window interval ('1 day')."""
    m = _GAP.match(gap.strip())
    if not m:
        raise StreamExprError(f"unsupported gap {gap!r}")
    return f"{m.group(1)} {m.group(2).lower()}"


def parse_stream_expr(text: str, tables: Dict[str, DataFrame]) -> DataFrame:
    """Streaming-expression text -> composed lazy DataFrame.

    ``tables`` is the collection registry (name -> DataFrame), the
    StreamFactory role."""
    return _eval(_P(text).parse(), tables)
