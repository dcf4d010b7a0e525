"""Dedup + text-analysis operator tests (training-data pipeline ops)."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lucene_solr_spark.operators import textproc as tp
from lucene_solr_spark.sources import load_documents


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_documents(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def dup_docs(spark):
    """Corpus with planted exact + near duplicates."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        Row(doc_id=0, text=base),
        Row(doc_id=1, text=base),                                    # exact dup
        Row(doc_id=2, text=base.replace("today", "tomorrow")),       # near dup
        Row(doc_id=3, text="completely different words about spark engines"),
        Row(doc_id=4, text=base),                                    # exact dup
        Row(doc_id=5, text="short"),
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup_groups(dup_docs):
    groups = {r["keep_id"]: r["n_copies"] for r in tp.exact_dedup(dup_docs).collect()}
    assert groups[0] == 3          # docs 0, 1, 4 identical
    assert groups[2] == 1 and groups[3] == 1 and groups[5] == 1


def test_exact_dedup_winners(dup_docs):
    ids = sorted(r["doc_id"] for r in tp.exact_dedup_winners(dup_docs).collect())
    assert ids == [0, 2, 3, 5]


def test_ngram_jaccard_exact_pairs(dup_docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in
             tp.ngram_jaccard_pairs(dup_docs, 0.5).collect()}
    assert pairs[(0, 1)] == 1.0 and pairs[(0, 4)] == 1.0 and pairs[(1, 4)] == 1.0
    assert 0.5 <= pairs[(0, 2)] < 1.0    # near dup: one shingle region differs
    assert (0, 3) not in pairs


def test_minhash_matches_exact_oracle(docs):
    """LSH candidates + exact verify == exhaustive Jaccard pairs."""
    exact = {(r["a"], r["b"]): round(r["jaccard"], 9)
             for r in tp.ngram_jaccard_pairs(docs, 0.5, "text").collect()}
    mh = {(r["a"], r["b"]): round(r["jaccard"], 9)
          for r in tp.minhash_dedup_pairs(docs, 0.5, "text").collect()}
    assert mh == exact
    assert len(exact) > 0


def test_minhash_signatures_deterministic(dup_docs):
    s1 = sorted(map(tuple, tp.minhash_signatures(dup_docs).collect()))
    s2 = sorted(map(tuple, tp.minhash_signatures(dup_docs).collect()))
    assert s1 == s2
    # identical docs -> identical band keys in every band
    by_id = {}
    for did, band, key in s1:
        by_id.setdefault(did, {})[band] = key
    assert by_id[0] == by_id[1] == by_id[4]


def test_simhash_near_dup(dup_docs):
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             tp.simhash_near_dup_pairs(dup_docs, 3).collect()}
    assert pairs[(0, 1)] == 0 and pairs[(0, 4)] == 0
    assert (0, 3) not in pairs


def test_simhash_pigeonhole_complete(docs):
    """Banding must find EVERY pair within the Hamming radius: compare
    against a brute-force popcount over all simhash pairs."""
    sig = {r["id"]: r["simhash"] for r in tp.simhash64(docs, "text").collect()}
    ids = sorted(sig)
    brute = set()
    arr = np.array([sig[i] for i in ids], dtype=np.int64).view(np.uint64)
    for i in range(len(ids)):
        x = arr[i] ^ arr
        ham = np.array([bin(int(v)).count("1") for v in x])
        for j in np.nonzero(ham <= 3)[0]:
            if ids[i] < ids[j]:
                brute.add((ids[i], ids[j]))
    banded = {(r["a"], r["b"]) for r in
              tp.simhash_near_dup_pairs(docs, 3, "text").collect()}
    assert banded == brute


def test_token_count(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="foo bar  baz42, qux!")])
    r = tp.token_count(df).collect()[0]
    assert r["ws_tokens"] == 4
    # pieces: foo bar baz 42 , qux !
    assert r["bpe_pieces"] == 7
    assert r["n_chars"] == 20


def test_quality_score_bounds(docs):
    rows = tp.quality_score(docs, "text").collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)
    assert all(0.0 <= r["alpha_ratio"] <= 1.0 for r in rows)
    long_doc = max(rows, key=lambda r: r["n_tokens"])
    short_doc = min(rows, key=lambda r: r["n_tokens"])
    assert long_doc["quality"] >= short_doc["quality"]


def test_language_id(spark):
    df = spark.createDataFrame([
        Row(doc_id=0, text="the cat and the dog are running in the garden of the house"),
        Row(doc_id=1, text="der hund und die katze laufen schnell durch einen schoenen wald"),
        Row(doc_id=2, text="le chat et le chien de la maison que nous avons"),
        Row(doc_id=3, text="xxxx zzzz qqqq"),
    ])
    out = {r["id"]: r["lang_pred"] for r in tp.language_id(df).collect()}
    assert out[0] == "en" and out[1] == "de" and out[2] == "fr"
    assert out[3] == "und"


def test_fingerprint_properties(spark):
    df = spark.createDataFrame([
        Row(doc_id=0, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="an utterly different document body entirely"),
        Row(doc_id=3, text="ab"),  # shorter than k
    ])
    rows = {r["id"]: r for r in tp.doc_fingerprint(df).collect()}
    assert rows[0]["digest"] == rows[1]["digest"]          # identical text
    assert rows[0]["digest"] != rows[2]["digest"]
    assert rows[0]["fingerprints"] == rows[1]["fingerprints"]
    assert rows[3]["fingerprints"] == [] and rows[3]["digest"] == 0


def test_fingerprint_shared_substring(spark):
    """Winnowing: docs sharing a long substring share fingerprints."""
    shared = "parallel segment merge policy with salted repartition keys"
    df = spark.createDataFrame([
        Row(doc_id=0, text="intro words " + shared + " trailing part one"),
        Row(doc_id=1, text="other prefix " + shared + " and another tail"),
        Row(doc_id=2, text="nothing in common whatsoever zebra quilt"),
    ])
    rows = {r["id"]: set(r["fingerprints"]) for r in tp.doc_fingerprint(df).collect()}
    assert rows[0] & rows[1]
    assert not (rows[0] & rows[2])


def test_fingerprint_vectorized_matches_scalar(spark):
    """The batch kernel must reproduce _fingerprint_scalar exactly —
    corpus rows, unicode/multibyte spice, and every small-n edge."""
    from lucene_solr_spark.operators.textproc import _fingerprint_scalar
    from lucene_solr_spark.sources import load_documents

    texts = [r["text"] for r in load_documents(
        spark, "/root/testdata/sf0.001").orderBy("doc_id").limit(40).collect()]
    texts += [
        "",                       # empty
        "abc",                    # < k chars
        "abcdefgh",               # exactly k -> one k-gram
        "abcdefghij",             # n <= window
        "abcdefghijklmnopqr",     # n > window
        "Motörhead café naïve – déjà vu 🚀 ROCKET",  # multibyte + upper
        "日本語のテキスト mixed ascii text here ok",
        "x" * 7,                  # boundary: len == k-1 after norm
        "aa bb cc dd ee ff gg hh ii jj",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["id"]: (list(r["fingerprints"]), r["digest"])
           for r in tp.doc_fingerprint(df).collect()}
    for i, t in enumerate(texts):
        fp, dig = _fingerprint_scalar(t)
        assert got[i] == (fp[:64], dig), f"doc {i}: {t[:40]!r}"


def test_repetition_score(spark):
    df = spark.createDataFrame([
        # "a b a b a b": uniq 2/6; 2-grams [ab,ba,ab,ba,ab] -> top "a b"
        # covers 3*2/6 = 1.0; 3-grams 4 total, 2 distinct -> dup 0.5
        Row(doc_id=0, text="a b a b a b"),
        # all-distinct tokens: uniq 1.0, dup3 0.0, top2 covers 2/5
        Row(doc_id=1, text="v w x y z"),
        # shorter than 3 tokens: gram stats must coalesce to 0
        Row(doc_id=2, text="hi there"),
        Row(doc_id=3, text="solo"),
    ])
    rows = {r["doc_id"]: r for r in tp.repetition_score(df, "text").collect()}
    assert rows[0]["n_tokens"] == 6
    assert abs(rows[0]["uniq_ratio"] - 2 / 6) < 1e-6
    assert abs(rows[0]["dup3_frac"] - 0.5) < 1e-6
    assert abs(rows[0]["top2_frac"] - 1.0) < 1e-6
    assert rows[1]["uniq_ratio"] == 1.0
    assert rows[1]["dup3_frac"] == 0.0
    assert abs(rows[1]["top2_frac"] - 0.4) < 1e-6
    assert rows[2]["dup3_frac"] == 0.0 and abs(rows[2]["top2_frac"] - 1.0) < 1e-6
    assert rows[3]["n_tokens"] == 1 and rows[3]["top2_frac"] == 0.0


def test_text_profile_signature_semantics(spark):
    """Order-invariance, min-token-length drop, quantization bucketing,
    and overwriteDupes newest-wins."""
    from lucene_solr_spark.operators.textproc import (
        signature_dedup_groups, text_profile_signature)

    df = spark.createDataFrame(
        [(0, "merge sort table sort"),       # base
         (1, "sort table sort merge"),       # shuffled -> same signature
         (2, "merge sort table sort x"),     # 1-char token dropped -> same
         (3, "merge sort table"),            # different multiset
         (4, "")],                           # empty profile
        "doc_id long, text string")
    sigs = {r["doc_id"]: r["signature"]
            for r in text_profile_signature(df).collect()}
    assert sigs[0] == sigs[1] == sigs[2]
    assert sigs[3] != sigs[0] and sigs[4] not in (sigs[0], sigs[3])

    groups = {r["signature"]: r for r in
              signature_dedup_groups(df).collect()}
    g = groups[sigs[0]]
    assert g["kept_id"] == 2 and g["n_docs"] == 3  # newest add survives

    # quantization: freqs {a:4, b:3} with quant 2 -> both bucket to
    # {a:4, b:2}; freq-1 terms vanish entirely
    hi = spark.createDataFrame(
        [(10, "aa aa aa aa bb bb bb cc"),
         (11, "aa aa aa aa bb bb dd")],
        "doc_id long, text string")
    s = {r["doc_id"]: r["signature"]
         for r in text_profile_signature(hi).collect()}
    assert s[10] == s[11]
