"""Guards for assumptions the driver-contract oracles rest on.

The standard-analyzer BM25 oracles in ``__spark_entry__.py`` reuse the
simple-split DuckDB tokenization; that is valid iff the documents
corpus tokenizes identically under both analyzers. The english/fuzzy
oracles embed a stem/expansion map generated from ``_CORPUS_VOCAB``;
that is valid iff the corpus vocabulary is exactly that set. Both facts
hold for the driver-generated testdata — these tests pin them so any
corpus drift fails loudly HERE instead of as a silent oracle mismatch.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

from lucene_solr_spark.analysis import tokenize

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
           if os.path.exists(d)]


@pytest.mark.parametrize("sf", SF_DIRS)
def test_corpus_is_simple_tokenizable(sf):
    """documents.text is lowercase ASCII words + spaces only, so the
    UAX#29 standard tokenizer and the [a-z0-9_]+ simple split produce
    the same stream (no joiner characters, digits, or uppercase)."""
    con = duckdb.connect()
    bad = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf}/documents.parquet') "
        "WHERE NOT regexp_full_match(text, '[a-z ]*')"
    ).fetchone()[0]
    assert bad == 0
    texts = [r[0] for r in con.execute(
        f"SELECT text FROM read_parquet('{sf}/documents.parquet') "
        "ORDER BY doc_id LIMIT 50").fetchall()]
    for t in texts:
        assert tokenize(t, "standard") == tokenize(t, "simple")


@pytest.mark.parametrize("sf", SF_DIRS)
def test_corpus_vocab_is_pinned(sf):
    """The corpus vocabulary equals _CORPUS_VOCAB exactly — the english
    stem map and fuzzy expansion embedded in the oracles enumerate it."""
    from __spark_entry__ import _CORPUS_VOCAB

    con = duckdb.connect()
    vocab = {r[0] for r in con.execute(
        f"SELECT DISTINCT unnest(string_split(text, ' ')) AS t "
        f"FROM read_parquet('{sf}/documents.parquet')").fetchall() if r[0]}
    assert vocab == set(_CORPUS_VOCAB)


def test_fuzzy_expansion_matches_engine_ranking():
    """_fuzzy_expansion must agree with expand_multiterm's chosen set
    for the graded query (spark~1 over the pinned vocabulary)."""
    from __spark_entry__ import _CORPUS_VOCAB, _fuzzy_expansion
    from lucene_solr_spark.plans.query import (
        BooleanQuery, MultiTermQuery, TermQuery, expand_multiterm,
        levenshtein)

    mq = MultiTermQuery("fuzzy", "spark", "content", 1.0, max_edits=1)
    matching = [t for t in _CORPUS_VOCAB if levenshtein(t, "spark") <= 1]
    expanded = expand_multiterm(mq, matching)
    want = _fuzzy_expansion("spark", 1)
    if isinstance(expanded, TermQuery):
        got = [expanded.term]
    elif isinstance(expanded, BooleanQuery):
        got = [c.term for c in expanded.should]
    else:
        raise AssertionError(f"unexpected expansion {expanded!r}")
    assert got == want
