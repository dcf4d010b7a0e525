"""Highlighting — UnifiedHighlighter-equivalent snippets (SURVEY.md
§2.13, `[U] lucene/highlighter/.../uhighlight/UnifiedHighlighter.java`).

Re-analyzes the stored text of the hit docs (the reference's ANALYSIS
offset source) with the SAME tokenizer the index used, finds query-term
char offsets, and emits the best-scoring passages with the terms
wrapped in pre/post tags. Runs as one ``mapInPandas`` over the already
top-k-sized hits DataFrame — never over the corpus.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame

from ..analysis import TOKEN_RE, tokenize

__all__ = ["highlight_text", "highlight"]


def _term_spans(text: str, terms: set) -> List[Tuple[int, int]]:
    """(start, end) char offsets of tokens whose analyzed form is a
    query term — offsets come from the same regex that tokenized the
    index, so highlights align with matches."""
    spans = []
    for m in TOKEN_RE.finditer(text.lower()):
        toks = tokenize(m.group(0))  # handles maxTokenLength chunks
        if any(t in terms for t in toks):
            spans.append((m.start(), m.end()))
    return spans


def highlight_text(text: str, terms: Sequence[str], pre: str = "<em>",
                   post: str = "</em>", window: int = 60,
                   max_passages: int = 3) -> List[str]:
    """-> up to ``max_passages`` snippets, best (= most matches) first,
    document order as tiebreak; deterministic."""
    tset = {t.lower() for t in terms}
    spans = _term_spans(text, tset)
    if not spans:
        return []
    # group spans into passages: spans within `window` chars merge
    passages: List[List[Tuple[int, int]]] = [[spans[0]]]
    for s in spans[1:]:
        if s[0] - passages[-1][-1][1] <= window:
            passages[-1].append(s)
        else:
            passages.append([s])
    ranked = sorted(range(len(passages)),
                    key=lambda i: (-len(passages[i]), passages[i][0][0]))
    out = []
    for pi in ranked[:max_passages]:
        grp = passages[pi]
        lo = max(0, grp[0][0] - window // 2)
        hi = min(len(text), grp[-1][1] + window // 2)
        # don't cut words: expand to whitespace
        while lo > 0 and not text[lo - 1].isspace():
            lo -= 1
        while hi < len(text) and not text[hi].isspace():
            hi += 1
        piece = []
        cur = lo
        for (s, e) in grp:
            piece.append(text[cur:s])
            piece.append(pre + text[s:e] + post)
            cur = e
        piece.append(text[cur:hi])
        out.append("".join(piece))
    return out


def highlight(hits: DataFrame, text_col: str, terms: Sequence[str],
              pre: str = "<em>", post: str = "</em>",
              max_passages: int = 3) -> DataFrame:
    """hits(text_col, ...) -> + ``snippets array<string>``."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    terms_l = [t.lower() for t in terms]
    # build a FRESH StructType (StructType.add mutates in place, which
    # would corrupt the input DataFrame's schema object)
    out_schema = StructType(
        list(hits.schema.fields)
        + [StructField("snippets", ArrayType(StringType()))]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["snippets"] = [
                highlight_text(t or "", terms_l, pre, post,
                               max_passages=max_passages)
                for t in pdf[text_col]
            ]
            yield pdf

    return hits.mapInPandas(gen, schema=out_schema)
