"""Function-query STRING parser — SURVEY.md §2.10 / VERDICT r2 missing #3.

Solr users write function queries as text (``recip(ms(NOW,date),
3.16e-11,1,1)``, ``scale(popularity,0,1)``); the reference's registry is
`[U] solr/core/.../search/ValueSourceParser.java`. This is a small
recursive-descent parser mapping that syntax onto the Column combinators
in ``functions/valuesource.py`` — the output is a plain Spark Column, so
Catalyst constant-folds literals and codegens the whole expression.

Grammar (the implemented subset — every function the library exposes):

    expr    := func | number | string | field
    func    := NAME '(' [expr (',' expr)*] ')'
    number  := float literal incl. scientific (3.16e-11)
    string  := '...' | "..."   (strdist metric names, literals)
    field   := bare identifier -> F.col(name)

``NOW`` resolves to the ``now`` argument (a datetime) so plans are
deterministic/reproducible — never wall-clock at parse time.
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import List, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import valuesource as vs

__all__ = ["parse_function_query", "apply_function_query",
           "parse_local_params", "local_params_filter",
           "FunctionQueryError"]


class FunctionQueryError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?(?![\w.]))"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<param>\$[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<str>'[^']*'|\"[^\"]*\")"
    r"|(?P<punc>[(),]))"
)


def _tokenize(text: str) -> List[tuple]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise FunctionQueryError(f"bad token at {text[pos:]!r}")
        if m.group("num") is not None:
            out.append(("num", float(m.group("num"))))
        elif m.group("name") is not None:
            out.append(("name", m.group("name")))
        elif m.group("param") is not None:
            out.append(("param", m.group("param")[1:]))
        elif m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1]))
        else:
            out.append(("punc", m.group("punc")))
        pos = m.end()
    out.append(("eof", None))
    return out


#: parsed node: a python float (literal), str (string literal), or Column
Node = Union[float, str, Column]


def _as_col(x: Node) -> Column:
    if isinstance(x, Column):
        return x
    return F.lit(x)


def _as_float(x: Node, fn: str) -> float:
    if isinstance(x, float):
        return x
    raise FunctionQueryError(f"{fn}() requires a numeric literal argument")


class _Parser:
    def __init__(self, text: str, df: Optional[DataFrame], now: Optional[datetime],
                 subqueries: Optional[dict] = None):
        self.toks = _tokenize(text)
        self.i = 0
        self.df = df
        self.now = now
        self.subqueries = subqueries or {}
        #: subquery param -> joined score column alias (filled by query())
        self.used: dict = {}
        #: bare field names referenced by the function text (filled at
        #: the F.col() leaf — the AST-derived replacement for callers
        #: that used to regex-scan the text for column mentions)
        self.fields: set = set()

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val: str):
        kind, v = self.next()
        if kind != "punc" or v != val:
            raise FunctionQueryError(f"expected {val!r}, got {v!r}")

    def parse(self) -> Node:
        node = self.expr()
        if self.peek()[0] != "eof":
            raise FunctionQueryError(f"trailing input at {self.toks[self.i:]}")
        return node

    def expr(self) -> Node:
        kind, v = self.next()
        if kind == "num":
            return v
        if kind == "str":
            return v
        if kind == "param":
            # only meaningful as query($x)'s argument; apply() unwraps
            return ("param", v)
        if kind == "name":
            if self.peek() == ("punc", "("):
                self.next()
                args: List[Node] = []
                if self.peek() != ("punc", ")"):
                    args.append(self.expr())
                    while self.peek() == ("punc", ","):
                        self.next()
                        args.append(self.expr())
                self.expect(")")
                return self.apply(v, args)
            if v == "NOW":
                if self.now is None:
                    raise FunctionQueryError("NOW used without now= anchor")
                return F.lit(self.now.isoformat(sep=" ")).cast("timestamp_ntz")
            self.fields.add(v)
            return F.col(v)
        raise FunctionQueryError(f"unexpected token {v!r}")

    # ---- registry (ValueSourceParser.java's addParser table)
    def apply(self, name: str, a: List[Node]) -> Node:
        n = name.lower()
        if n == "query":
            # query($q[, default]): the subquery's score for each doc, a
            # default (Solr: 0) for non-matching docs — `[U] solr/core/
            # .../search/ValueSourceParser.java :: QueryValueSource` via
            # FunctionQParser.parseNestedQuery. The caller supplies the
            # scored DataFrame; apply_function_query joins it on doc_id.
            if not a or not (isinstance(a[0], tuple) and a[0][0] == "param"):
                raise FunctionQueryError("query() takes a $param reference")
            pname = a[0][1]
            if pname not in self.subqueries:
                raise FunctionQueryError(
                    f"query(${pname}) has no bound subquery — pass "
                    f"subqueries={{{pname!r}: <scored DataFrame>}}")
            default = _as_float(a[1], n) if len(a) > 1 else 0.0
            alias = f"__fq_{pname}"
            self.used[pname] = alias
            return F.coalesce(F.col(alias), F.lit(default))
        if any(isinstance(x, tuple) for x in a):
            raise FunctionQueryError("$param is only valid inside query()")
        if n == "payload":
            # payload(field, 'term'[, default[, 'func']]) — the term and
            # func arrive as QUOTED string literals (a bare word would
            # parse as a field reference); `[U] solr/core/.../search/
            # ValueSourceParser.java :: "payload"`
            if len(a) < 2 or not isinstance(a[1], str):
                raise FunctionQueryError(
                    "payload() takes (field, 'term'[, default[, 'func']])")
            default = _as_float(a[2], n) if len(a) > 2 else 0.0
            func = a[3] if len(a) > 3 else "average"
            if not isinstance(func, str):
                raise FunctionQueryError("payload() func must be a string")
            return vs.payload_fn(_as_col(a[0]), a[1], func=func,
                                 default=default)
        cols = [_as_col(x) for x in a]
        if n in ("sum", "add"):
            out = cols[0]
            for c in cols[1:]:
                out = out + c
            return out
        if n == "sub":
            return cols[0] - cols[1]
        if n in ("product", "mul"):
            out = cols[0]
            for c in cols[1:]:
                out = out * c
            return out
        if n == "div":
            return cols[0] / cols[1]
        if n == "abs":
            return F.abs(cols[0])
        if n == "pow":
            return F.pow(cols[0], cols[1])
        if n == "sqrt":
            return F.sqrt(cols[0])
        if n == "log":                       # Solr log() is base-10
            return F.log10(cols[0])
        if n == "ln":
            return F.log(cols[0])
        if n == "exp":
            return F.exp(cols[0])
        if n in ("min",):
            return F.least(*cols)
        if n in ("max",):
            return F.greatest(*cols)
        if n == "floor":
            return F.floor(cols[0])
        if n == "ceil":
            return F.ceil(cols[0])
        if n == "map":
            default = cols[4] if len(a) > 4 else None
            return vs.map_fn(cols[0], _as_float(a[1], n), _as_float(a[2], n),
                             _as_float(a[3], n), default)
        if n == "scale":
            if self.df is None:
                raise FunctionQueryError("scale() needs df= (global min/max)")
            return vs.scale_fn(self.df, cols[0], _as_float(a[1], n),
                               _as_float(a[2], n))
        if n == "recip":
            return vs.recip(cols[0], _as_float(a[1], n), _as_float(a[2], n),
                            _as_float(a[3], n))
        if n == "linear":
            return vs.linear(cols[0], _as_float(a[1], n), _as_float(a[2], n))
        if n == "ms":
            if len(a) == 1:
                return vs.ms(cols[0], F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"))
            return vs.ms(cols[0], cols[1])
        if n == "strdist":
            metric = a[2] if len(a) > 2 else "edit"
            if metric not in ("edit", "levenshtein"):
                raise FunctionQueryError(f"strdist metric {metric!r} not supported")
            return vs.strdist_levenshtein(cols[0], cols[1])
        if n == "ord":
            return vs.ord_fn(cols[0])
        if n == "rord":
            return vs.rord_fn(cols[0])
        if n == "if":
            return F.when(cols[0].cast("boolean"), cols[1]).otherwise(cols[2])
        if n == "exists":
            return cols[0].isNotNull()
        if n == "def":
            return F.coalesce(cols[0], cols[1])
        if n in ("geodist", "hsin"):
            return vs.haversine_km(cols[0], cols[1], cols[2], cols[3])
        raise FunctionQueryError(f"unknown function {name!r}")


def parse_function_query(text: str, df: Optional[DataFrame] = None,
                         now: Optional[datetime] = None) -> Column:
    """Solr function-query text -> Spark Column.

    ``df`` is required for corpus-global sources (scale); ``now``
    anchors NOW (deterministic, as a TIMESTAMP_NTZ literal). For
    ``query($q)`` use :func:`apply_function_query`, which performs the
    required score joins.
    """
    return _as_col(_Parser(text, df, now).parse())


def function_query_fields(text: str, df: Optional[DataFrame] = None,
                          now: Optional[datetime] = None) -> set:
    """Field names a function-query text references, derived from the
    parsed AST (not a regex scan of the text — column names with regex
    metacharacters and field-like words inside string literals were
    mis-detected by the old \\b-scan)."""
    p = _Parser(text, df, now)
    p.parse()
    return set(p.fields)


def apply_function_query(df: DataFrame, text: str,
                         subqueries: Optional[dict] = None,
                         out_col: str = "fq_score", key: str = "doc_id",
                         now: Optional[datetime] = None) -> DataFrame:
    """Evaluate a function query that may embed ``query($q)`` /
    ``boost``-style subquery scores (SURVEY.md §2.10 row "query($q),
    boost"; `[U] solr/core/.../search/ValueSourceParser.java ::
    QueryValueSource`).

    ``subqueries`` maps param name -> scored DataFrame ``(key, score)``
    (e.g. ``IndexReader.score_all(...)``). Each referenced subquery is
    LEFT-joined on ``key`` (a keyed equi-join Catalyst/AQE is free to
    broadcast when the match set is small; at 10^12 docs both sides
    shuffle on the same key once) and non-matching docs fall back to
    the query() default (Solr: 0). Returns ``df`` + ``out_col``.
    Solr's ``{!boost b=f(x)} q`` is the composition
    ``product(query($q), f(x))``.
    """
    p = _Parser(text, df, now, subqueries)
    col = _as_col(p.parse())
    for pname, alias in p.used.items():
        sub = subqueries[pname]
        score_col = next(c for c in sub.columns if c != key)
        df = df.join(sub.select(key, F.col(score_col).alias(alias)),
                     key, "left")
    return df.withColumn(out_col, col).drop(*p.used.values())


# ------------------------------------------------------- local params

_LOCAL_RE = re.compile(
    r"^\{!(?P<type>\w+)(?P<params>(?:\s+[\w.]+=(?:'[^']*'|\"[^\"]*\"|\S+?(?=\s|\})))*)\s*\}(?P<body>.*)$",
    re.S)
_PARAM_RE = re.compile(r"([\w.]+)=('[^']*'|\"[^\"]*\"|\S+)")


def parse_local_params(text: str):
    """Split a Solr local-params query string ``{!type k=v ...}body``
    into (type, params dict, body). `[U] solr/core/.../search/
    QParser.java :: localParams syntax`."""
    m = _LOCAL_RE.match(text.strip())
    if not m:
        raise FunctionQueryError(f"not a local-params query: {text!r}")
    params = {k: v.strip("'\"") for k, v in _PARAM_RE.findall(m.group("params"))}
    return m.group("type"), params, m.group("body").strip()


def local_params_filter(text: str, df: Optional[DataFrame] = None,
                        now: Optional[datetime] = None) -> Column:
    """Filter-producing local-params parsers as a boolean Column:

    * ``{!frange l=.. u=.. incl=true incu=true}func`` — FunctionRange
      query (`[U] solr/core/.../search/FunctionRangeQParserPlugin.java`):
      docs whose function value lies in [l, u]; either bound optional,
      bound inclusivity via incl/incu (default true). The function is
      a plain Column, so the predicate stays inside whole-stage codegen
      and pushes down when the body is a bare field.
    * ``{!terms f=field separator=,}v1,v2,...`` — TermsQParserPlugin
      (`[U] solr/core/.../search/TermsQParserPlugin.java`): a set-
      membership filter compiled to IN (Catalyst folds it to a literal
      set; on a parquet field it reaches PushedFilters).
    """
    qtype, params, body = parse_local_params(text)
    if qtype == "frange":
        col = parse_function_query(body, df, now)
        cond = F.lit(True)
        if "l" in params:
            lo = float(params["l"])
            cond = cond & (col >= lo if params.get("incl", "true") == "true"
                           else col > lo)
        if "u" in params:
            hi = float(params["u"])
            cond = cond & (col <= hi if params.get("incu", "true") == "true"
                           else col < hi)
        return cond
    if qtype == "terms":
        fld = params["f"]
        sep = params.get("separator", ",")
        # values are whitespace-trimmed and cast to the FIELD's type
        # (TermsQParserPlugin is field-type-aware: a double field
        # compared to the string '42' must not rely on implicit casts)
        vals: list = [v.strip() for v in body.split(sep)]
        if df is not None and fld in df.columns:
            from pyspark.sql import types as T

            dt = df.schema[fld].dataType
            if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType,
                               T.LongType)):
                vals = [int(v) for v in vals]
            elif isinstance(dt, (T.FloatType, T.DoubleType)):
                vals = [float(v) for v in vals]
            elif isinstance(dt, T.DecimalType):
                from decimal import Decimal as _D

                vals = [_D(v) for v in vals]
            elif isinstance(dt, T.BooleanType):
                vals = [v.lower() in ("true", "1") for v in vals]
        return F.col(fld).isin(vals)
    raise FunctionQueryError(f"unsupported local-params type {qtype!r}")
