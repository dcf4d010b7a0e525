"""StandardAnalyzer-equivalent tokenizer semantics (SURVEY.md §2.2, §4.4.7)."""

import pandas as pd
from hypothesis import given, strategies as st

from lucene_solr_spark.analysis import (
    MAX_TOKEN_LENGTH,
    analyze,
    tokenize,
    tokenize_series,
)


def test_basic_split_and_lowercase():
    assert tokenize("Hello, World! Spark-SQL") == ["hello", "world", "spark", "sql"]


def test_underscore_is_extendnumlet():
    # UAX#29 WB13a/b: underscore joins
    assert tokenize("foo_bar baz_1") == ["foo_bar", "baz_1"]


def test_alnum_runs_join():
    # WB9/10: letter<->digit join
    assert tokenize("abc123def x86") == ["abc123def", "x86"]


def test_midnumlet_between_letters():
    # WB6/7: '.' and ''' between letters join
    assert tokenize("foo.bar o'neil it’s") == ["foo.bar", "o'neil", "it’s"]


def test_midnum_between_digits():
    # WB11/12
    assert tokenize("3.14 1,000 v1.2.3") == ["3.14", "1,000", "v1.2.3"]


def test_no_join_across_classes():
    # '.' between letter and digit does NOT join (WB6 needs letters both sides)
    assert tokenize("a.1") == ["a", "1"]
    # ',' between letters does not join
    assert tokenize("a,b") == ["a", "b"]
    # trailing separators drop
    assert tokenize("end. next,") == ["end", "next"]


def test_unicode():
    assert tokenize("Motörhead café") == ["motörhead", "café"]
    assert tokenize("日本語 text") == ["日本語", "text"]
    # Turkish dotted capital I: str.lower() expands to i + combining dot;
    # the combining mark U+0307 is not \w so the token splits after 'i'.
    # Pinned behavior: engine == oracle by shared code (SURVEY.md §2.2).
    assert tokenize("İstanbul")[0].startswith("i")


def test_max_token_length_split():
    long_tok = "a" * (MAX_TOKEN_LENGTH * 2 + 10)
    toks = tokenize(f"x {long_tok} y")
    assert toks[0] == "x"
    assert toks[1] == "a" * MAX_TOKEN_LENGTH
    assert toks[2] == "a" * MAX_TOKEN_LENGTH
    assert toks[3] == "a" * 10
    assert toks[4] == "y"


def test_positions():
    assert analyze("To be or not to be") == [
        ("to", 0), ("be", 1), ("or", 2), ("not", 3), ("to", 4), ("be", 5),
    ]


def test_simple_analyzer():
    assert tokenize("Foo.Bar 3.14 baz_1", analyzer="simple") == [
        "foo", "bar", "3", "14", "baz_1",
    ]


@given(st.lists(st.text(max_size=200), max_size=20))
def test_series_matches_scalar(texts):
    s = pd.Series(texts, dtype="object")
    vec = tokenize_series(s).tolist()
    assert vec == [tokenize(t) for t in texts]


@given(st.text(max_size=500))
def test_tokens_nonempty_and_lowercase(text):
    for t in tokenize(text):
        assert t
        assert len(t) <= MAX_TOKEN_LENGTH
        assert t == t.lower()


def test_stop_analyzer_gaps():
    from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, analyze, tokenize

    text = "The quick fox and the lazy dog"
    assert tokenize(text, "standard_stop") == ["quick", "fox", "lazy", "dog"]
    assert analyze(text, "standard_stop") == [
        ("quick", 1), ("fox", 2), ("lazy", 5), ("dog", 6)
    ]
    assert "the" in ENGLISH_STOP_WORDS and "quick" not in ENGLISH_STOP_WORDS


def test_porter_battery():
    """Published examples from Porter (1980) + reference-implementation
    departures (logi->log etc.)."""
    from lucene_solr_spark.analysis.porter import porter_stem

    expected = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "radicalli": "radic", "differentli": "differ", "vileli": "vile",
        "analogousli": "analog", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "callousness": "callous",
        "formaliti": "formal", "sensitiviti": "sensit",
        "sensibiliti": "sensibl", "triplicate": "triplic",
        "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr",
        "hopeful": "hope", "goodness": "good", "revival": "reviv",
        "allowance": "allow", "inference": "infer", "airliner": "airlin",
        "gyroscopic": "gyroscop", "adjustable": "adjust",
        "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt",
        "communism": "commun", "activate": "activ",
        "homologou": "homolog", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
    }
    got = {w: porter_stem(w) for w in expected}
    assert got == expected


def test_english_analyzer_chain():
    from lucene_solr_spark.analysis import analyze, tokenize

    # possessive strip -> stop filter (with position gap) -> stem
    assert tokenize("John's merges are the fastest", "english") == \
        ["john", "merg", "fastest"]
    pairs = analyze("John's merges are the fastest", "english")
    # positions keep pre-stop indices: are(2)/the(3) removed
    assert pairs == [("john", 0), ("merg", 1), ("fastest", 4)]


def test_english_engine_matches_oracle(spark, tmp_path):
    import numpy as np

    from lucene_solr_spark.operators.build import build_index
    from lucene_solr_spark.operators.search import IndexReader
    from lucene_solr_spark.sources import load_source_table
    from tests.oracle import OracleIndex

    corpus = load_source_table(spark, "/root/testdata/sf0.001")
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, docs_per_seg=256, analyzer="english")
    idx = IndexReader(spark, d)
    oracle = OracleIndex(sorted(
        (r["doc_id"], r["content"])
        for r in corpus.select("doc_id", "content").collect()
    ), analyzer="english")
    for q in ["merging", "queries OR tables", "customers AND sorted",
              '"value merge"']:
        got, total = idx.search_with_total(q, k=20)
        exp = oracle.search(q, k=20)
        assert [(dd, np.float32(s)) for dd, s in got] == \
            [(dd, np.float32(s)) for dd, s in exp.score_docs], q
        assert total == exp.total_hits, q


def test_whitespace_keyword_ascii_folding():
    from lucene_solr_spark.analysis import tokenize

    # WhitespaceAnalyzer: split on whitespace only, NO lowercase
    assert tokenize("Foo-Bar baz.Qux", "whitespace") == ["Foo-Bar", "baz.Qux"]
    # KeywordAnalyzer: whole input verbatim
    assert tokenize("Foo Bar/baz", "keyword") == ["Foo Bar/baz"]
    # ASCIIFolding: accents stripped before standard tokenization
    assert tokenize("Motörhead café naïve façade", "ascii_folding") == \
        ["motorhead", "cafe", "naive", "facade"]


def test_shingle_edge_ngram_synonym_streams():
    from lucene_solr_spark.analysis import analyze, tokenize

    assert tokenize("a b c", "shingle") == ["a", "a b", "b", "b c", "c"]
    assert analyze("a b c", "shingle") == [
        ("a", 0), ("a b", 0), ("b", 1), ("b c", 1), ("c", 2)]

    # edge ngrams 2..5, grams only
    assert tokenize("sparkly go", "edge_ngram") == \
        ["sp", "spa", "spar", "spark", "go"]
    assert analyze("sparkly go", "edge_ngram") == [
        ("sp", 0), ("spa", 0), ("spar", 0), ("spark", 0), ("go", 1)]

    # synonyms at the SAME position (posIncr 0)
    assert analyze("big spark", "synonym_demo") == [
        ("big", 0), ("large", 0), ("spark", 1), ("flame", 1)]


def test_synonym_index_matches_synonym_query(spark, tmp_path):
    """A synonym-analyzed index matches the synonym term, and phrases
    treat same-position synonyms as alternatives."""
    from lucene_solr_spark.operators.build import build_index
    from lucene_solr_spark.operators.search import IndexReader

    src = spark.createDataFrame(
        [(0, "r", "p", "c", "t", "the big spark engine"),
         (1, "r", "p", "c", "t", "a flame burns"),
         (2, "r", "p", "c", "t", "nothing here")],
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )
    d = str(tmp_path / "idx")
    build_index(spark, src, d, docs_per_seg=4, analyzer="synonym_demo")
    idx = IndexReader(spark, d)
    # 'flame' matches doc 0 (synonym of spark) AND doc 1 (literal)
    assert {doc for doc, _ in idx.search_with_total("flame", k=10)[0]} == {0, 1}
    # phrase across a same-position synonym: "large spark" matches doc 0
    # because 'large' sits at the same position as 'big'
    assert {doc for doc, _ in idx.search_with_total('"large spark"', k=10)[0]} == {0}


def test_soundex_kernel_and_phonetic_stream():
    """Classic Soundex per commons-codec US_ENGLISH (Solr's
    PhoneticFilterFactory default codec family): known-answer vectors
    incl. the H/W-transparency cases, then the inject=true emission."""
    from lucene_solr_spark.analysis import analyze, soundex, tokenize

    for w, exp in [("Robert", "R163"), ("Rupert", "R163"),
                   ("Ashcraft", "A261"), ("Tymczak", "T522"),
                   ("Pfister", "P236"), ("Honeyman", "H555"),
                   ("spark", "S162"), ("spork", "S162"),
                   ("a", "A000"), ("12345", "")]:
        assert soundex(w) == exp, w
    # inject=true: original token kept, code at the SAME position
    assert analyze("spark merge", "phonetic") == [
        ("spark", 0), ("S162", 0), ("merge", 1), ("M620", 1)]
    assert tokenize("the spark", "phonetic") == \
        ["the", "T000", "spark", "S162"]


def test_phonetic_index_matches_misspelled_query(spark, tmp_path):
    """Phonetic indexing + query expansion: 'spork' is absent from the
    corpus but shares S162 with 'spark', so the query matches."""
    from lucene_solr_spark.operators.build import build_index
    from lucene_solr_spark.operators.search import IndexReader

    src = spark.createDataFrame(
        [(0, "r", "p", "c", "t", "the spark engine"),
         (1, "r", "p", "c", "t", "a merge pass"),
         (2, "r", "p", "c", "t", "nothing here")],
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )
    d = str(tmp_path / "idx")
    build_index(spark, src, d, docs_per_seg=4, analyzer="phonetic")
    idx = IndexReader(spark, d)
    assert {doc for doc, _ in idx.search_with_total("spork", k=10)[0]} == {0}
    # codes do not cross-match unrelated words
    assert {doc for doc, _ in idx.search_with_total("merge", k=10)[0]} == {1}


def test_word_delimiter_parts_battery():
    """WDGF subword rules (`[U] lucene/analysis/common/.../miscellaneous/
    WordDelimiterGraphFilter.java` javadoc examples, text_en_splitting
    defaults): case/number splits, UPPER-run boundary, possessive."""
    from lucene_solr_spark.analysis import word_delimiter_parts

    for tok, exp in [("Wi-Fi", ["Wi", "Fi"]),
                     ("PowerShot", ["Power", "Shot"]),
                     ("SD500", ["SD", "500"]),
                     ("500x", ["500", "x"]),
                     ("XLTransformer", ["XL", "Transformer"]),
                     ("O'Neil's", ["O", "Neil"]),
                     ("j2se", ["j", "2", "se"]),
                     ("src17", ["src", "17"]),
                     ("ALLCAPS", ["ALLCAPS"]),
                     ("hello", ["hello"]),
                     ("42", ["42"])]:
        assert word_delimiter_parts(tok) == exp, tok


def test_word_delimiter_stream():
    """Whitespace tokenize -> WDGF -> lowercase; parts occupy
    consecutive positions (catenate/preserve off), so phrases see the
    emitted stream one term per position."""
    from lucene_solr_spark.analysis import analyze, tokenize, tokenize_for_phrase

    assert analyze("corpus/src17 docs/423.txt", "word_delimiter") == [
        ("corpus", 0), ("src", 1), ("17", 2),
        ("docs", 3), ("423", 4), ("txt", 5)]
    assert tokenize("PowerShot SD500", "word_delimiter") == \
        ["power", "shot", "sd", "500"]
    assert tokenize_for_phrase("PowerShot SD500", "word_delimiter") == \
        ["power", "shot", "sd", "500"]


def test_common_grams_stream():
    """CommonGramsFilter: unigrams all kept; 'a_b' gram emitted at the
    FIRST token's position iff either member is a common word."""
    from lucene_solr_spark.analysis import analyze, tokenize

    assert analyze("the line sort", "common_grams") == [
        ("the", 0), ("the_line", 0), ("line", 1), ("sort", 2)]
    assert analyze("sort a row", "common_grams") == [
        ("sort", 0), ("sort_a", 0), ("a", 1), ("a_row", 1), ("row", 2)]
    assert tokenize("the line", "common_grams") == ["the", "the_line", "line"]


def test_word_delimiter_index_search(spark, tmp_path):
    """e2e: number part of a filename-ish field is searchable after
    WDGF splitting; unsplit query terms stay single terms."""
    from lucene_solr_spark.operators.build import build_index
    from lucene_solr_spark.operators.search import IndexReader

    src = spark.createDataFrame(
        [(0, "r", "p", "c", "t", "shots/PowerShot-SD500.jpg"),
         (1, "r", "p", "c", "t", "shots/IXUS300.jpg"),
         (2, "r", "p", "c", "t", "notes/readme.txt")],
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string")
    d = str(tmp_path / "wd")
    build_index(spark, src, d, docs_per_seg=4, analyzer="word_delimiter")
    idx = IndexReader(spark, d)
    assert {doc for doc, _ in idx.search_with_total("500", k=10)[0]} == {0}
    assert {doc for doc, _ in idx.search_with_total("jpg", k=10)[0]} == {0, 1}
    assert {doc for doc, _ in
            idx.search_with_total("powershot", k=10)[0]} == set()


def test_reversed_emitter_properties():
    from hypothesis import given, strategies as st

    from lucene_solr_spark.analysis import REVERSE_MARKER, analyze, tokenize

    @given(st.text(alphabet="abc xyz_019", max_size=60))
    def check(text):
        pairs = analyze(text, "reversed_wildcard")
        base = [(t, p) for t, p in pairs if not t.startswith(REVERSE_MARKER)]
        marked = [(t, p) for t, p in pairs if t.startswith(REVERSE_MARKER)]
        # one marked twin per original, same position, exact reverse
        assert len(base) == len(marked)
        for (t, p), (m, mp) in zip(base, marked):
            assert mp == p and m == REVERSE_MARKER + t[::-1]
        # the base stream equals the standard analysis of the text
        assert [t for t, _ in base] == tokenize(text, "standard")

    check()


def test_field_length_discounts_overlaps():
    """discountOverlaps=true (BM25Similarity default): posIncr-0
    stacked tokens don't count toward the norm length; emitted-token
    count (sumTotalTermFreq) still includes them."""
    from lucene_solr_spark.analysis import analyze, field_length

    # phonetic inject: token + soundex code share one position
    toks = analyze("spark merge", "phonetic")
    assert len(toks) > 2                 # codes injected
    assert field_length(toks) == 2       # but dl counts positions
    # reversed_wildcard doubles every token at the same position
    toks = analyze("spark merge dark", "reversed_wildcard")
    assert len(toks) == 6
    assert field_length(toks) == 3
    # stop-gap analyzers: no stacking, dl == emitted count
    toks = analyze("the spark and the merge", "standard_stop")
    assert field_length(toks) == len(toks)


def test_path_hierarchy_tokenizer():
    """PathHierarchyTokenizer: cumulative '/'-prefixes, all stacked at
    the head position (posIncr 0 after the first), norm length 1."""
    from lucene_solr_spark.analysis import analyze, field_length, tokenize

    assert tokenize("a/b/c", "path_hierarchy") == ["a", "a/b", "a/b/c"]
    pairs = analyze("corpus/src3 docs/42.txt", "path_hierarchy")
    assert pairs == [("corpus", 0), ("corpus/src3 docs", 0),
                     ("corpus/src3 docs/42.txt", 0)]
    assert field_length(pairs) == 1          # discountOverlaps
    assert tokenize("", "path_hierarchy") == []
    assert tokenize("noslash", "path_hierarchy") == ["noslash"]
    # no lowercase fold (descendent_path is a verbatim chain)
    assert tokenize("A/B", "path_hierarchy") == ["A", "A/B"]


def test_ngram_filter():
    """Interior NGramTokenFilter (3..4): every gram stacked at the
    source position, overlapping starts included."""
    from lucene_solr_spark.analysis import analyze, tokenize

    assert tokenize("spark", "ngram") == \
        ["spa", "par", "ark", "spar", "park"]
    # short tokens below min emit nothing; positions stay the source's
    pairs = analyze("ab part", "ngram")
    assert pairs == [("par", 1), ("art", 1), ("part", 1)]
