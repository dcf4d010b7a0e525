"""ClassicSimilarity (TF-IDF) engine path vs the shared float kernel.

Same pattern as the BM25 goldens: the distributed engine (pluggable
score_fn through make_query_kernel) must produce float32-identical
scores to a single-process evaluation of functions/tfidf.py over the
same tokens — `[U] lucene/core/src/test/.../TestClassicSimilarity.java`
role. The DuckDB side is covered by the tfidf_* oracle entries.
"""

import numpy as np
import pytest

from lucene_solr_spark.analysis import tokenize
from lucene_solr_spark.functions.smallfloat import int_to_byte4
from lucene_solr_spark.functions.tfidf import (
    classic_norm_table,
    classic_phrase_weight,
    classic_score_tf,
    classic_term_weight,
)
from lucene_solr_spark.operators.build import build_index
from lucene_solr_spark.operators.search import IndexReader

DOCS = [
    (0, "spark merge spark spark join window"),
    (1, "merge vector hash"),
    (2, "spark"),
    (3, "window window window window window window window window spark spark"),
    (4, "join hash scan sort"),
    (5, "spark merge vector " * 7),
    (6, "the quick brown fox jumps over the lazy dog spark"),
]


@pytest.fixture(scope="module")
def classic_idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tfidf"))
    df = spark.createDataFrame(
        [(i, t, "r", f"p/{i}", "c0", "en") for i, t in DOCS],
        "doc_id long, content string, repo string, path string, "
        "commit string, lang string")
    build_index(spark, df, d, docs_per_seg=3)
    return IndexReader(spark, d, similarity="classic")


def _expected(term_weights, k=10):
    """Single-process classic scorer: sum the per-term scores of every
    doc matching any term, rank score desc / doc asc."""
    table = classic_norm_table()
    toks = {i: tokenize(t) for i, t in DOCS}
    scores = {}
    for term, w in term_weights:
        for i, tk in toks.items():
            tf = tk.count(term)
            if tf:
                s = classic_score_tf(
                    w, np.array([tf]), np.array([int_to_byte4(len(tk))]),
                    table)[0]
                scores[i] = np.float32(scores.get(i, np.float32(0.0)) + s)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ranked


def _dfs(term):
    return sum(1 for _, t in DOCS if term in tokenize(t))


def test_classic_term_scores_exact(classic_idx):
    n = len(DOCS)
    w = classic_term_weight(_dfs("spark"), n)
    exp = _expected([("spark", w)])
    got = [(r["doc_id"], np.float32(r["score"]))
           for r in classic_idx.search("spark", k=10).collect()]
    assert got == [(i, s) for i, s in exp]
    # doc 3 (10 tokens, tf=2) must rank below doc 2 (1 token, tf=1):
    # sqrt(2)/sqrt(10) < 1/1 — the length norm actually bites
    ids = [i for i, _ in got]
    assert ids.index(2) < ids.index(3)


def test_classic_disjunction_float32_sum(classic_idx):
    n = len(DOCS)
    exp = _expected([("spark", classic_term_weight(_dfs("spark"), n)),
                     ("merge", classic_term_weight(_dfs("merge"), n)),
                     ("vector", classic_term_weight(_dfs("vector"), n))])
    got = [(r["doc_id"], np.float32(r["score"]))
           for r in classic_idx.search("spark OR merge OR vector", k=10).collect()]
    assert got == [(i, s) for i, s in exp]


def test_classic_vs_bm25_differ(classic_idx, spark):
    bm25 = IndexReader(spark, classic_idx.index_dir, similarity="bm25")
    c = {r["doc_id"]: r["score"] for r in classic_idx.search("spark", k=10).collect()}
    b = {r["doc_id"]: r["score"] for r in bm25.search("spark", k=10).collect()}
    assert set(c) == set(b)          # same match set, different scores
    assert any(abs(c[i] - b[i]) > 1e-6 for i in c)


def test_classic_phrase_weight_kernel():
    # idfExplain sums float32 idfs in float64 then casts once
    w = classic_phrase_weight([2, 3], 7, boost=2.0)
    from lucene_solr_spark.functions.tfidf import classic_idf
    exp = np.float32(np.float32(2.0) * np.float32(
        float(classic_idf(2, 7)) + float(classic_idf(3, 7))))
    assert w == exp


def test_bad_similarity_rejected(classic_idx, spark):
    with pytest.raises(ValueError):
        IndexReader(spark, classic_idx.index_dir, similarity="dfr")


def test_explain_matches_engine_score(classic_idx, spark):
    """Explanation leaf sum must equal the reported score bit-for-bit,
    for BOTH similarities (debugQuery=true)."""
    for sim in ("bm25", "classic"):
        from lucene_solr_spark.operators.search import IndexReader
        idx = IndexReader(spark, classic_idx.index_dir, similarity=sim)
        top = idx.search("spark OR merge", k=3).collect()
        for r in top:
            exp = idx.explain("spark OR merge", r["doc_id"])
            assert exp["matched"] and exp["similarity"] == sim
            assert np.float32(exp["score"]) == np.float32(r["score"]), \
                (sim, r["doc_id"], exp)
            assert all(d["tf"] > 0 for d in exp["details"])
    # non-matching / absent doc
    exp = classic_idx.explain("spark", 999999)
    assert exp["matched"] is False
