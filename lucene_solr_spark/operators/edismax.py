"""edismax: multi-field dismax query across per-field indexes.

Mirrors `[U] solr/core/src/java/org/apache/solr/search/
ExtendedDismaxQParser.java` (SURVEY.md §2.4): the user query is split
into clauses; each clause becomes a DisjunctionMaxQuery across the
``qf`` fields (per-field boost, per-field analyzer, per-field BM25
stats); clauses combine as a BooleanQuery with minimum-should-match.

Spark-first shape: Lucene stores each field's postings + norms
separately — here each field IS its own index directory (same physical
layout), and the cross-field combine is a DataFrame aggregation over
(doc_id, float32 score) pairs:

    per (clause, field):  reader.score_all(...)      -- kernel scan
    per clause:           groupBy(doc_id) -> max + tie*(sum-max)
    across clauses:       groupBy(doc_id) -> sum, count >= mm
    top-k:                orderBy(score desc, doc_id) limit k

Only id/score pairs ever shuffle; the final step is
TakeOrderedAndProject. Per-field float32 scores are cast to double
BEFORE combining (2-operand double math is order-free), so the driver
oracle can reproduce the combine exactly.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.query import TermQuery
from .search import IndexReader

__all__ = ["parse_qf", "edismax_search", "edismax_score_all",
           "edismax_pf_bf"]


def parse_qf(qf: str) -> Dict[str, float]:
    """'content^2 path' -> {'content': 2.0, 'path': 1.0} (qf syntax of
    the reference parser)."""
    out: Dict[str, float] = {}
    for part in qf.split():
        m = re.fullmatch(r"([\w.]+)(?:\^(\d+(?:\.\d+)?))?", part)
        if not m:
            raise ValueError(f"bad qf component {part!r}")
        out[m.group(1)] = float(m.group(2)) if m.group(2) else 1.0
    return out


def _clauses(query: str) -> List[str]:
    """Whitespace-split user clauses (the edismax escape-hatch parse:
    each token is one dismax clause; operators are not interpreted)."""
    return [t for t in query.split() if t]


def edismax_search(readers: Dict[str, IndexReader], qf: str | Dict[str, float],
                   query: str, tiebreak: float = 0.0, mm: int = 1,
                   k: int = 10) -> DataFrame:
    """-> DataFrame(doc_id, score double) top-k under edismax semantics."""
    return (
        edismax_score_all(readers, qf, query, tiebreak, mm)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def edismax_score_all(readers: Dict[str, IndexReader],
                      qf: str | Dict[str, float], query: str,
                      tiebreak: float = 0.0, mm: int = 1) -> DataFrame:
    """-> DataFrame(doc_id, score double): the FULL edismax match set
    (no top-k) — the /select facade composes this with fq docSet
    intersection, facets and cursor paging.

    ``readers``: field name -> that field's IndexReader (per-field
    index dir == Lucene's per-field postings/norms). Each clause is
    analyzed PER FIELD with that field's analyzer, exactly like the
    reference's per-field query chain.
    """
    boosts = parse_qf(qf) if isinstance(qf, str) else dict(qf)
    missing = set(boosts) - set(readers)
    if missing:
        raise ValueError(f"qf fields without an index: {sorted(missing)}")
    clause_dfs: List[DataFrame] = []
    for ci, raw in enumerate(_clauses(query)):
        field_dfs: List[DataFrame] = []
        for fld, boost in boosts.items():
            rdr = readers[fld]
            from ..analysis import tokenize

            toks = tokenize(raw, rdr.manifest.analyzer)
            if not toks:
                continue
            q = TermQuery(toks[0], boost=boost) if len(toks) == 1 else None
            if q is None:
                from ..plans.query import BooleanQuery

                q = BooleanQuery(should=tuple(
                    TermQuery(t, boost=boost) for t in toks))
            field_dfs.append(
                rdr.score_all(q).select(
                    "doc_id", F.col("score").cast("double").alias("s"))
            )
        if not field_dfs:
            continue
        u = field_dfs[0]
        for d in field_dfs[1:]:
            u = u.unionByName(d)
        clause = (
            u.groupBy("doc_id")
            .agg(F.max("s").alias("mx"), F.sum("s").alias("tot"))
            .select(
                "doc_id",
                (F.col("mx") + F.lit(float(tiebreak)) * (F.col("tot") - F.col("mx"))
                 ).alias("cs"),
            )
            .withColumn("clause", F.lit(ci))
        )
        clause_dfs.append(clause)
    if not clause_dfs:
        spark = next(iter(readers.values())).spark
        return spark.createDataFrame([], "doc_id long, score double")
    allc = clause_dfs[0]
    for d in clause_dfs[1:]:
        allc = allc.unionByName(d)
    return (
        allc.groupBy("doc_id")
        .agg(F.sum("cs").alias("score"),
             F.count_distinct("clause").alias("nc"))
        .filter(F.col("nc") >= mm)
        .select("doc_id", "score")
    )


def edismax_pf_bf(readers: Dict[str, IndexReader],
                  qf: str | Dict[str, float], query: str,
                  pf: str | Dict[str, float] | None = None,
                  bf: str | None = None,
                  bf_source: DataFrame | None = None,
                  bq: str | None = None,
                  bq_field: str | None = None,
                  tiebreak: float = 0.0, mm: int = 1) -> DataFrame:
    """edismax with phrase-field and boost-function additions (`[U]
    solr/core/.../search/ExtendedDismaxQParser.java` pf/bf params).

    * ``pf`` — 'field^boost ...' like qf: the WHOLE query, as one exact
      phrase, scored per pf field; the dismax (max + tie*rest) of those
      phrase scores is ADDED to matching main-query docs (Lucene: the
      phrase DisjunctionMaxQuery rides the main BooleanQuery as a
      SHOULD clause, so it boosts but never admits new docs — hence the
      left join).
    * ``bf`` — an ADDITIVE function-query (Solr bf; boost= would be
      multiplicative): parsed by functions.funcparser over
      ``bf_source`` (doc_id + stored fields), evaluated as a plain
      Column so the whole addition stays codegen'd.
    * ``bq`` — an ADDITIVE boost QUERY (Solr bq: parsed like q, its
      scores ride the main BooleanQuery as a SHOULD clause — boosts
      matching docs, never admits new ones — hence the left join).
      Scored against ``bq_field``'s reader (default: qf's first).

    Combine order (all double): ((main + pf_dismax) + bf) + bq — each
    component keyed by doc_id, id/score-only joins.
    Returns (doc_id, score).
    """
    from ..plans.query import PhraseQuery

    score = edismax_score_all(readers, qf, query, tiebreak, mm)
    if pf:
        pboosts = parse_qf(pf) if isinstance(pf, str) else dict(pf)
        phrase_dfs: List[DataFrame] = []
        for fld, boost in pboosts.items():
            rdr = readers[fld]
            from ..analysis import tokenize_for_phrase

            toks = tuple(tokenize_for_phrase(query, rdr.manifest.analyzer))
            if len(toks) < 2:
                continue
            phrase_dfs.append(rdr.score_all(
                PhraseQuery(toks, boost=boost)).select(
                    "doc_id", F.col("score").cast("double").alias("ps")))
        if phrase_dfs:
            u = phrase_dfs[0]
            for d in phrase_dfs[1:]:
                u = u.unionByName(d)
            ph = (u.groupBy("doc_id")
                  .agg(F.max("ps").alias("pmx"), F.sum("ps").alias("ptot"))
                  .select("doc_id",
                          (F.col("pmx") + F.lit(float(tiebreak))
                           * (F.col("ptot") - F.col("pmx"))).alias("pscore")))
            score = (score.join(ph, "doc_id", "left")
                     .select("doc_id",
                             (F.col("score")
                              + F.coalesce(F.col("pscore"), F.lit(0.0))
                              ).alias("score")))
    if bf:
        from ..functions.funcparser import parse_function_query

        if bf_source is None:
            raise ValueError("bf needs bf_source (doc_id + stored fields)")
        vals = bf_source.select(
            "doc_id", parse_function_query(bf, bf_source).cast("double")
            .alias("bfv"))
        score = (score.join(vals, "doc_id", "left")
                 .select("doc_id",
                         (F.col("score") + F.coalesce(F.col("bfv"),
                                                      F.lit(0.0)))
                         .alias("score")))
    if bq:
        from ..plans.query import parse_query

        boosts = parse_qf(qf) if isinstance(qf, str) else dict(qf)
        rdr = readers[bq_field or next(iter(boosts))]
        bqs = rdr.score_all(
            parse_query(bq, analyzer=rdr.manifest.analyzer)).select(
                "doc_id", F.col("score").cast("double").alias("bqv"))
        score = (score.join(bqs, "doc_id", "left")
                 .select("doc_id",
                         (F.col("score") + F.coalesce(F.col("bqv"),
                                                      F.lit(0.0)))
                         .alias("score")))
    return score
