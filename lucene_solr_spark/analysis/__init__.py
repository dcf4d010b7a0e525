"""Analysis chain: StandardAnalyzer-equivalent tokenization.

Mirrors the semantics of
`[U] lucene/core/src/java/org/apache/lucene/analysis/standard/
StandardTokenizer.java` (UAX#29 word-break segmentation, JFlex grammar
`StandardTokenizerImpl.jflex`) + `LowerCaseFilter.java`, with the
StandardAnalyzer default stop set (EMPTY since Lucene 7.0 —
SURVEY.md §2.2).

Implemented as a single compiled regex over the UAX#29 rule subset that
matters for this corpus (SURVEY.md §2.2 / §4.4.7):

- WB5/8/9/10/13a/b: runs of letters, digits and underscore
  (ExtendNumLet) form one token — Python's ``\\w`` covers exactly this
  class (letters L*, digits Nd, underscore, plus Unicode alphanumerics).
- WB6/7:  AHLetter x (MidLetter | MidNumLetQ) x AHLetter join —
  a letter token continues across ``. ' ’ · :`` when flanked by
  letters on both sides.
- WB11/12: Numeric x (MidNum | MidNumLetQ) x Numeric join — a digit
  token continues across ``. , ; ' ’`` when flanked by digits.
- maxTokenLength=255: longer tokens are emitted as consecutive
  255-char chunks, each with its own position (StandardTokenizer's
  scanner-buffer split behavior; flagged "verify split-vs-drop" in
  SURVEY.md §2.2 — split is implemented, and the choice is pinned by
  the golden fixtures so engine == oracle either way).

Lowercasing uses ``str.lower()``; the Java `Character.toLowerCase`
divergence cases (e.g. Turkish dotted I) are pinned by tests
(SURVEY.md §2.2).

Everything here is pure Python/pandas so the Spark engine (via
Arrow-batched pandas UDFs) and the test oracle share one tokenizer by
construction.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import pandas as pd

__all__ = [
    "MAX_TOKEN_LENGTH",
    "TOKEN_RE",
    "SIMPLE_TOKEN_RE",
    "tokenize",
    "tokenize_for_phrase",
    "tokenize_series",
    "ENGLISH_STOP_WORDS",
    "analyze",
    "analyzer_has_gaps",
]

MAX_TOKEN_LENGTH = 255

# letter = Unicode letter (no digits, no underscore)
_L = r"[^\W\d_]"
_D = r"\d"
# MidLetter + MidNumLet + Single_Quote, flanked by letters
_SEP_LETTER = rf"(?<={_L})[.':’·](?={_L})"
# MidNum + MidNumLet + Single_Quote, flanked by digits
_SEP_DIGIT = rf"(?<={_D})[.,;'’](?={_D})"
_SEP = rf"(?:{_SEP_LETTER}|{_SEP_DIGIT})"

TOKEN_RE = re.compile(rf"\w+(?:{_SEP}\w+)*", re.UNICODE)

# "simple" analyzer: ASCII alnum/underscore runs on lowercased text.
# Used by the SQL-oracle queries because DuckDB's RE2 regexes cannot
# express the lookbehind/lookahead joins above; the engine accepts
# analyzer="simple" so Spark and DuckDB tokenize identically.
SIMPLE_TOKEN_RE = re.compile(r"[a-z0-9_]+")

_ANALYZERS = {"standard": TOKEN_RE, "simple": SIMPLE_TOKEN_RE,
              "standard_stop": TOKEN_RE, "english": TOKEN_RE,
              "whitespace": re.compile(r"\S+"),
              "keyword": None,  # whole input = one token
              "ascii_folding": TOKEN_RE,
              "shingle": TOKEN_RE,
              "edge_ngram": TOKEN_RE,
              "synonym_demo": TOKEN_RE,
              "phonetic": TOKEN_RE,
              "word_delimiter": re.compile(r"\S+"),
              "common_grams": TOKEN_RE,
              "reversed_wildcard": TOKEN_RE,
              "path_hierarchy": None,  # whole input -> prefix stack
              "ngram": TOKEN_RE}

#: ReversedWildcardFilter marker (`[U] lucene/analysis/common/.../
#: reverse/ReverseStringFilter.java :: START_OF_HEADING_MARKER` via
#: `solr/core/.../analysis/ReversedWildcardFilterFactory.java`): every
#: token is ALSO indexed as U+0001 + reversed text at the same
#: position (withOriginal=true), so a leading wildcard rewrites to a
#: scan-pushdown-able PREFIX over the marked twins.
REVERSE_MARKER = "\x01"

# EdgeNGram bounds (`[U] lucene/analysis/common/.../ngram/
# EdgeNGramTokenFilter.java`): emit prefixes of length min..max per
# token (grams only, like the filter with outputOriginal=false).
EDGE_NGRAM_MIN, EDGE_NGRAM_MAX = 2, 5

# SynonymGraphFilter demo map (`[U] .../synonym/SynonymGraphFilter.java`,
# expand=true): synonyms are emitted AT THE SAME POSITION as the source
# token (posIncr 0), so phrases and proximity treat them as alternatives.
SYNONYM_DEMO_MAP = {
    "spark": ("flame",),
    "fast": ("quick", "rapid"),
    "big": ("large",),
}

# StopFilter (SURVEY.md §2.2, `[U] .../analysis/StopFilter.java`) with
# Lucene's classic English stop set (`[U] .../analysis/en/
# EnglishAnalyzer.java :: ENGLISH_STOP_WORDS_SET`). StandardAnalyzer's
# own default stop set is EMPTY since 7.0, so "standard" applies none;
# "standard_stop" layers this set WITH position-increment gaps
# (PositionIncrementAttribute: removed tokens leave holes, so phrases
# do not match across a removed stopword — pinned by tests).
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)

_STOP_SETS = {name: frozenset() for name in _ANALYZERS}
_STOP_SETS["standard_stop"] = ENGLISH_STOP_WORDS
_STOP_SETS["english"] = ENGLISH_STOP_WORDS


def _fold_ascii(text: str) -> str:
    """ASCIIFoldingFilter approximation (`[U] .../miscellaneous/
    ASCIIFoldingFilter.java` is a ~2000-case mapping table; NFKD +
    combining-mark strip covers the Latin accent family, documented
    subset)."""
    import unicodedata

    return "".join(
        c for c in unicodedata.normalize("NFKD", text)
        if not unicodedata.combining(c)
    )


def _emit_shingle(raw):
    """ShingleFilter (`[U] .../shingle/ShingleFilter.java`) defaults:
    output unigrams + 2-shingles ('a b'), shingle at the position of
    its first token."""
    out = list(zip(raw, range(len(raw))))
    out += [(f"{a} {b}", i) for i, (a, b) in enumerate(zip(raw, raw[1:]))]
    out.sort(key=lambda p: p[1])
    return out


def _emit_edge_ngram(raw):
    out = []
    for i, t in enumerate(raw):
        for n in range(EDGE_NGRAM_MIN, min(EDGE_NGRAM_MAX, len(t)) + 1):
            out.append((t[:n], i))
    return out


# NGramTokenFilter bounds (`[U] lucene/analysis/common/.../ngram/
# NGramTokenFilter.java`): every INTERIOR gram of length min..max per
# token (preserveOriginal=false), all stacked at the source position.
NGRAM_MIN, NGRAM_MAX = 3, 4


def _emit_ngram(raw):
    out = []
    for i, t in enumerate(raw):
        for n in range(NGRAM_MIN, min(NGRAM_MAX, len(t)) + 1):
            for s in range(0, len(t) - n + 1):
                out.append((t[s:s + n], i))
    return out


def _emit_synonym(raw):
    out = []
    for i, t in enumerate(raw):
        out.append((t, i))
        for syn in SYNONYM_DEMO_MAP.get(t, ()):
            out.append((syn, i))  # posIncr 0: same position
    return out


_WD_ALNUM_RE = re.compile(r"[A-Za-z]+|[0-9]+")
_WD_CASE_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z]?[a-z]+")


def word_delimiter_parts(tok: str) -> List[str]:
    """WordDelimiterGraphFilter subword split (`[U] lucene/analysis/
    common/.../miscellaneous/WordDelimiterGraphFilter.java`, Solr
    text_en_splitting defaults: generateWordParts=generateNumberParts=
    splitOnCaseChange=splitOnNumerics=stemEnglishPossessive=1,
    catenate*=preserveOriginal=0). Split points: non-alphanumerics,
    letter<->digit transitions, and lower->UPPER case changes; an
    UPPER-run followed by Upper+lower keeps the run and starts the new
    part at its last capital (``PowerSQLShot`` -> Power, SQL, Shot).
    ASCII subset (documented: the driver corpus is ASCII; Lucene's
    full Unicode WordDelimiterIterator tables are out of scope)."""
    if len(tok) > 2 and tok[-1] in "sS" and tok[-2] in "'’":
        tok = tok[:-2]  # stemEnglishPossessive
    out: List[str] = []
    for run in _WD_ALNUM_RE.findall(tok):
        if run[0].isdigit():
            out.append(run)
        else:
            out.extend(_WD_CASE_RE.findall(run))
    return out


def _emit_word_delimiter(raw):
    """Whitespace tokens -> WDGF parts -> LowerCaseFilter. Each part
    occupies its own consecutive position (the graph filter advances
    posIncr per generated subword when catenate/preserve are off)."""
    out = []
    pos = 0
    for t in raw:
        for part in word_delimiter_parts(t):
            out.append((part.lower(), pos))
            pos += 1
    return out


#: CommonGramsFilter word set (`[U] lucene/analysis/common/.../
#: commongrams/CommonGramsFilter.java`): Solr ships it with the
#: stopword list as `words`; the classic English stop set is reused so
#: engine and oracle share one table.
COMMON_WORDS = ENGLISH_STOP_WORDS
COMMON_GRAM_SEP = "_"


def _emit_common_grams(raw):
    """CommonGramsFilter (QueryParser side NOT modeled — index-time
    emission only): every unigram is kept, and each adjacent pair where
    either member is a common word also emits ``a_b`` at the FIRST
    token's position (posIncr 0 on the gram), so a phrase like
    "the line" can be answered by one posting list."""
    out = [(t, i) for i, t in enumerate(raw)]
    for i in range(len(raw) - 1):
        a, b = raw[i], raw[i + 1]
        if a in COMMON_WORDS or b in COMMON_WORDS:
            out.append((f"{a}{COMMON_GRAM_SEP}{b}", i))
    out.sort(key=lambda p: p[1])
    return out


_SOUNDEX_CODE = {}
for _grp, _dig in (("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
                   ("l", "4"), ("mn", "5"), ("r", "6")):
    for _c in _grp:
        _SOUNDEX_CODE[_c] = _dig


def soundex(tok: str) -> str:
    """Classic American Soundex (`[U] solr/core/.../schema/ — Solr's
    PhoneticFilterFactory delegates to commons-codec
    ``Soundex.US_ENGLISH``): first letter + 3 digits. Commons-codec
    semantics: non-letters stripped first; H/W are transparent (two
    same-code consonants separated only by H/W collapse to one digit,
    separated by a vowel they emit twice); vowels reset the previous
    code. Tokens with no ASCII letter encode to '' (no code emitted)."""
    letters = [c for c in tok.lower() if "a" <= c <= "z"]
    if not letters:
        return ""
    out = letters[0].upper()
    prev = _SOUNDEX_CODE.get(letters[0], "")
    for c in letters[1:]:
        if c in "hw":
            continue  # transparent: prev code carries across
        code = _SOUNDEX_CODE.get(c, "")
        if not code:          # vowel: resets the duplicate-collapse
            prev = ""
            continue
        if code != prev:
            out += code
            if len(out) == 4:
                break
        prev = code
    return (out + "000")[:4]


def _emit_phonetic(raw):
    """PhoneticFilter (`[U] lucene/analysis/phonetic/.../
    PhoneticFilter.java`, inject=true default): each token is emitted
    verbatim, followed by its encoder output at the SAME position
    (posIncr 0) when the code is non-empty and differs from the token."""
    out = []
    for i, t in enumerate(raw):
        out.append((t, i))
        code = soundex(t)
        if code and code != t:
            out.append((code, i))
    return out


#: multi-emission token filters: text -> [(term, position)] where one
#: source token may yield several terms (shingles, grams, synonyms).
#: These route through the explicit-positions build path (like stop
#: gaps); dl = number of EMITTED tokens (FieldInvertState semantics).
def _emit_reversed(raw):
    """ReversedWildcardFilter, withOriginal=true: each token plus its
    marker-prefixed reverse at the SAME position (posIncr 0) — phrases
    and proximity see only the originals; leading wildcards rewrite to
    a prefix over the marked twins (IndexReader._expand)."""
    out = []
    for i, t in enumerate(raw):
        out.append((t, i))
        out.append((REVERSE_MARKER + t[::-1], i))
    return out


#: PathHierarchyTokenizer delimiter (`[U] lucene/analysis/common/.../
#: path/PathHierarchyTokenizer.java :: DEFAULT_DELIMITER`)
PATH_HIERARCHY_DELIMITER = "/"


def _emit_path_hierarchy(raw):
    """PathHierarchyTokenizer (`[U] lucene/analysis/common/.../path/
    PathHierarchyTokenizer.java`): from one input path emit every
    cumulative prefix — "a/b/c" -> a, a/b, a/b/c — the head at
    posIncr 1 and the rest STACKED at the same position (posIncr 0),
    so norms discount everything but the head (discountOverlaps)."""
    out = []
    for i, t in enumerate(raw):
        parts = t.split(PATH_HIERARCHY_DELIMITER)
        for d in range(1, len(parts) + 1):
            out.append((PATH_HIERARCHY_DELIMITER.join(parts[:d]), i))
    return out


_EMITTERS = {"shingle": _emit_shingle, "edge_ngram": _emit_edge_ngram,
             "synonym_demo": _emit_synonym, "phonetic": _emit_phonetic,
             "word_delimiter": _emit_word_delimiter,
             "common_grams": _emit_common_grams,
             "reversed_wildcard": _emit_reversed,
             "path_hierarchy": _emit_path_hierarchy,
             "ngram": _emit_ngram}

#: emitters whose output stream is strictly one term per position (no
#: stacking) — phrase queries can use the emitted stream directly.
_LINEAR_EMITTERS = frozenset({"word_delimiter"})

# EnglishAnalyzer chain (`[U] lucene/analysis/common/.../en/
# EnglishAnalyzer.java`): StandardTokenizer -> EnglishPossessiveFilter
# -> LowerCase -> StopFilter(English set) -> PorterStemFilter. The
# possessive strip runs on the raw token stream; stemming runs on the
# post-stop stream (so stopwords are matched UNstemmed, like Lucene).


def _stemmer_for(analyzer: str):
    if analyzer == "english":
        from .porter import porter_stem

        return porter_stem
    return None


def _strip_possessive(tok: str) -> str:
    """EnglishPossessiveFilter: drop a trailing 's / ’s."""
    if len(tok) > 2 and tok[-1] == "s" and tok[-2] in ("'", "’"):
        return tok[:-2]
    return tok

# ---------------------------------------------------------------- JVM side
#
# The SAME tokenization as a Spark Column expression: lower + split on
# the COMPLEMENT of the token pattern (Java regex supports the
# lookarounds). Classes are spelled with explicit Unicode properties so
# they equal Python's: \w == [\p{L}\p{N}_], [^\W\d_] == [\p{L}\p{Nl}\p{No}],
# \d == \p{Nd}  (Java's (?U)\w would also include combining marks Mn,
# which Python's \w does not — the Turkish İ -> i+U+0307 case; pinned
# by test_analysis.test_jvm_tokens_match_python).
# Running the tokenizer inside Tungsten keeps the hot loop JVM-side and
# whole-stage-codegen'd; Python only ever sees compact Arrow arrays.
_J_W = r"\p{L}\p{N}_"
_J_LET = r"[\p{L}\p{Nl}\p{No}]"
_J_DIG = r"\p{Nd}"
JVM_SPLIT_REGEX = (
    "(?:"
    f"[^{_J_W}.,:;'’·]"
    f"|(?<!{_J_LET})[:·]"
    f"|[:·](?!{_J_LET})"
    f"|(?<!{_J_DIG})[,;]"
    f"|[,;](?!{_J_DIG})"
    f"|(?<!{_J_LET})(?<!{_J_DIG})[.'’]"
    f"|(?<={_J_LET})[.'’](?!{_J_LET})"
    f"|(?<={_J_DIG})[.'’](?!{_J_DIG})"
    ")+"
)
JVM_SIMPLE_SPLIT_REGEX = "[^a-z0-9_]+"


def tokens_column(col, analyzer: str = "standard"):
    """Spark Column: text -> array<string> of tokens, identical to
    ``tokenize()`` except the maxTokenLength=255 chunking, which the
    build kernel applies to the (rare) affected rows."""
    from pyspark.sql import functions as F

    if analyzer == "standard":
        pattern = JVM_SPLIT_REGEX
    elif analyzer == "simple":
        pattern = JVM_SIMPLE_SPLIT_REGEX
    else:
        raise ValueError(f"unknown analyzer {analyzer!r}")
    return F.filter(F.split(F.lower(col), pattern, -1), lambda t: t != "")


def field_length(pairs) -> int:
    """FieldInvertState length under BM25Similarity's DEFAULT
    discountOverlaps=true (`[U] lucene/core/.../search/similarities/
    BM25Similarity.java :: setDiscountOverlaps`): posIncr-0 overlap
    tokens (synonyms, shingles/grams stacked on a source position,
    phonetic codes, reversed-wildcard twins) do NOT count toward the
    norm's doc length. Every emitter stacks overlaps on an existing
    source position, so the discounted length is the count of DISTINCT
    positions in the (term, position) stream. NOTE the Lucene
    asymmetry kept intact: avgdl = sumTotalTermFreq / docCount still
    counts overlap tokens (BM25Similarity.avgFieldLength), so segment
    ``sum_dl`` stats stay emitted-token sums — only the per-doc norm
    byte discounts."""
    return len({p for _, p in pairs})


def analyzer_has_gaps(analyzer: str) -> bool:
    """True when the chain's positions are not 0..dl-1 (stop-filter
    holes, or multi-emission filters stacking terms on one position) —
    the build then uses the explicit (term, position) stream."""
    return bool(_STOP_SETS[analyzer]) or analyzer in _EMITTERS


def _split_long(tok: str) -> List[str]:
    if len(tok) <= MAX_TOKEN_LENGTH:
        return [tok]
    return [tok[i : i + MAX_TOKEN_LENGTH] for i in range(0, len(tok), MAX_TOKEN_LENGTH)]


def _raw_tokens(text: str, analyzer: str) -> List[str]:
    """Pre-stop-filter token stream (positions = list index)."""
    if analyzer == "keyword":
        # KeywordTokenizer: the whole input verbatim (no lowercase)
        return _split_long(text) if text else []
    if analyzer == "path_hierarchy":
        # PathHierarchyTokenizer consumes the whole input as ONE path
        # (no lowercase, no length split — chopping a path would
        # corrupt its prefix chain); the emitter stacks the prefixes
        return [text] if text else []
    if analyzer == "ascii_folding":
        text = _fold_ascii(text)
    pattern = _ANALYZERS[analyzer]
    if analyzer in ("whitespace", "word_delimiter"):
        # WhitespaceTokenizer: no lowercase (word_delimiter's case-
        # change splits need the original case; its emitter lowercases
        # the parts afterwards, mirroring WDGF -> LowerCaseFilter)
        raw = pattern.findall(text)
    else:
        raw = pattern.findall(text.lower())
    if analyzer == "english":
        raw = [_strip_possessive(t) for t in raw]
    out: List[str] = []
    for t in raw:
        if len(t) > MAX_TOKEN_LENGTH:
            out.extend(_split_long(t))
        else:
            out.append(t)
    return out


def tokenize_for_phrase(text: str, analyzer: str = "standard") -> List[str]:
    """Phrase-query tokenization: multi-emission analyzers (shingle /
    edge-ngram / synonym) expand to the UNIGRAM base chain — a phrase
    must stay one term per position (Lucene's SynonymGraphFilter builds
    a graph phrase; same-position synonyms in the INDEX still match the
    base phrase, which covers the expand=true indexing side)."""
    if analyzer in _EMITTERS:
        if text is None:
            return []
        if analyzer in _LINEAR_EMITTERS:
            # one term per position: the emitted stream IS the phrase
            return tokenize(text, analyzer)
        return _raw_tokens(text, analyzer)
    return tokenize(text, analyzer)


def tokenize(text: str, analyzer: str = "standard") -> List[str]:
    """text -> lowercased token list (position = list index).

    Lowercasing happens BEFORE segmentation (in Lucene the order is
    tokenize-then-LowerCaseFilter, but for the supported separator
    classes case pairs never change word-break class membership, so the
    two orders agree except where ``str.lower()`` expands a codepoint —
    e.g. Turkish İ -> 'i' + combining dot. Lowercase-first is chosen so
    the engine's one-pass pandas kernel and this oracle-side function
    are identical by construction; the İ case is pinned by tests).
    """
    if text is None:
        return []
    out = _raw_tokens(text, analyzer)
    emit = _EMITTERS.get(analyzer)
    if emit:
        return [t for t, _ in emit(out)]
    stop = _STOP_SETS[analyzer]
    if stop:
        out = [t for t in out if t not in stop]
    stem = _stemmer_for(analyzer)
    if stem:
        out = [stem(t) for t in out]
    return out


def analyze(text: str, analyzer: str = "standard") -> List[Tuple[str, int]]:
    """text -> [(term, position)] with 0-based positions.

    Position = token index in the PRE-stop-filter stream
    (`[U] .../tokenattributes/PositionIncrementAttribute.java`):
    stop-filtered analyzers leave gaps, so phrases never match across a
    removed stopword. Norm length (dl) = number of EMITTED tokens
    (FieldInvertState.length counts surviving increments).
    """
    if text is None:
        return []
    raw = _raw_tokens(text, analyzer)
    emit = _EMITTERS.get(analyzer)
    if emit:
        return emit(raw)
    stop = _STOP_SETS[analyzer]
    stem = _stemmer_for(analyzer)
    if not stop and not stem:
        return list(zip(raw, range(len(raw))))
    pairs = [(t, i) for i, t in enumerate(raw) if not stop or t not in stop]
    if stem:
        pairs = [(stem(t), i) for t, i in pairs]
    return pairs


def tokenize_series(texts: pd.Series, analyzer: str = "standard") -> pd.Series:
    """Vectorized (pandas-level) tokenization of a string Series.

    This is the kernel the Arrow-batched UDFs call — pandas `.str`
    fast path, no per-row Spark Python UDF (BASELINE.json:L15).
    """
    if analyzer in _EMITTERS or analyzer in ("keyword", "whitespace",
                                             "ascii_folding"):
        return texts.fillna("").map(lambda t: tokenize(t, analyzer))
    pattern = _ANALYZERS[analyzer]
    lowered = texts.fillna("").str.lower()
    toks = lowered.str.findall(pattern)
    if analyzer == "english":
        toks = toks.map(lambda ts: [_strip_possessive(t) for t in ts])
    # long-token split is rare: only post-process rows that need it
    needs_split = toks.map(lambda ts: any(len(t) > MAX_TOKEN_LENGTH for t in ts))
    if needs_split.any():
        toks = toks.copy()
        toks[needs_split] = toks[needs_split].map(
            lambda ts: [c for t in ts for c in _split_long(t)]
        )
    stop = _STOP_SETS[analyzer]
    if stop:
        toks = toks.map(lambda ts: [t for t in ts if t not in stop])
    stem = _stemmer_for(analyzer)
    if stem:
        toks = toks.map(lambda ts: [stem(t) for t in ts])
    return toks
