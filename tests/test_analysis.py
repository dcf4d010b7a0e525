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
