"""Solr ``/select`` request facade (SURVEY.md §3.2).

The reference's most-used API surface: one parameter map drives query,
filter queries, sort, pagination, field list and facets
(`[U] solr/core/src/java/org/apache/solr/handler/component/
SearchHandler.java` + ``QueryComponent``/``FacetComponent``). This
facade composes the engine's existing operators the same way the
reference's component chain does:

* ``q``            — main query (classic syntax), scored with BM25.
* ``fq``           — list of filter queries: non-scoring, cacheable in
  Solr; here each fq becomes a doc-id SEMI-JOIN applied BEFORE the
  top-k (exactly Solr's docSet intersection — scores never change, and
  a filtered doc can never crowd the page).
* ``sort``         — ``score desc`` (default) or ``<field> asc|desc``
  over stored fields, with doc_id as the deterministic tiebreak.
* ``start``/``rows`` — pagination; the plan stays a single global
  TakeOrderedAndProject over start+rows, then the page is sliced.
* ``fl``           — stored-field projection (column pruning in the
  docmeta join).
* ``facet.field``  — per-field value counts over the q+fq match set
  (FacetComponent semantics: facets count the FILTERED result set, not
  the page).

Scale shape: the match set is (doc_id, score) pairs only; fq joins and
facet joins ship ids, never text. Stats stay delete-blind; tombstones
are masked inside score_all like every other query surface.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.query import parse_query
from . import streamexpr as sx

__all__ = ["solr_select", "SelectResponse"]


@dataclass
class SelectResponse:
    docs: DataFrame                      #: the page (fl columns + score)
    matches: DataFrame                   #: full q+fq match set (doc_id, score)
    facets: Dict[str, DataFrame] = field(default_factory=dict)

    def num_found(self) -> int:
        return self.matches.count()


def _fq_ids(idx, fq: str) -> DataFrame:
    """One filter query -> doc_id set. ``field:value`` against a STORED
    field filters docmeta (Solr fq on a docValues field); anything else
    parses as a query against the indexed content."""
    if ":" in fq:
        fld, _, val = fq.partition(":")
        if fld in idx.docmeta.columns and fld != "doc_id":
            return (idx.docmeta.filter(F.col(fld) == val)
                    .select("doc_id"))
    return idx.score_all(
        parse_query(fq, analyzer=idx.manifest.analyzer)).select("doc_id")


def _match_set(idx, q: str, fqs: Sequence[str]) -> DataFrame:
    scored = idx.score_all(parse_query(q, analyzer=idx.manifest.analyzer))
    for fq in fqs:
        scored = scored.join(_fq_ids(idx, fq), "doc_id", "left_semi")
    return scored


def solr_select(idx, params: Dict) -> SelectResponse:
    """Execute a Solr-style parameter map against an IndexReader.

    Supported keys: ``q`` (required), ``fq`` (str or list), ``sort``,
    ``start``, ``rows``, ``fl`` (list of stored fields), and
    ``facet.field`` (str or list)."""
    q = params["q"]
    fqs = params.get("fq", [])
    if isinstance(fqs, str):
        fqs = [fqs]
    start = int(params.get("start", 0))
    rows = int(params.get("rows", 10))
    sort = params.get("sort", "score desc")
    fl = list(params.get("fl", ["doc_id"]))

    matches = _match_set(idx, q, fqs)

    parts = sort.split()
    sort_field, direction = parts[0], (parts[1] if len(parts) > 1 else "asc")
    if sort_field == "score":
        ordered = matches
        order_cols = [F.desc("score") if direction == "desc" else F.asc("score"),
                      F.asc("doc_id")]
    else:
        ordered = matches.join(
            idx.docmeta.select("doc_id", sort_field), "doc_id", "left")
        order_cols = [F.desc(sort_field) if direction == "desc"
                      else F.asc(sort_field), F.asc("doc_id")]

    # one TakeOrderedAndProject over start+rows, page sliced driver-free
    w = Window.orderBy(*order_cols)
    page_ids = (
        ordered.orderBy(*order_cols).limit(start + rows)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > start)
        .select("doc_id", "score", F.col("_rn").alias("position"))
    )
    want = [c for c in fl if c not in ("doc_id", "score")]
    docs = page_ids
    if want:
        docs = page_ids.join(idx.docmeta.select("doc_id", *want), "doc_id", "left")
    docs = docs.select("position", "doc_id", "score", *want)

    facets: Dict[str, DataFrame] = {}
    ffields = params.get("facet.field", [])
    if isinstance(ffields, str):
        ffields = [ffields]
    for ff in ffields:
        joined = matches.select("doc_id").join(
            idx.docmeta.select("doc_id", ff), "doc_id", "left")
        facets[ff] = sx.facet_field(joined, ff)

    return SelectResponse(docs=docs, matches=matches, facets=facets)
