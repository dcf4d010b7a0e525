"""Generate the frozen golden-TopDocs fixtures (FIXTURES.md §2-3).

Pure Python (no Spark): the deterministic fixture corpus + the
exhaustive oracle produce tests/fixtures/queries.json and
golden_topdocs.json. Once committed, these freeze the engine's
semantics — any unintended tokenizer/scoring change breaks
tests/test_golden.py even though oracle and engine share kernels.

Run: python tools/gen_golden.py
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_solr_spark.analysis import tokenize  # noqa: E402
from lucene_solr_spark.sources import synth_corpus_local  # noqa: E402
from tests.oracle import OracleIndex  # noqa: E402

N_DOCS = 1200
SEED = 42
KS = [1, 10, 100]
FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "fixtures")

LONG_CHUNK = ("longtoken_" + "x" * 300)[:255]

FIXED_QUERIES = [
    # --- term (10): hot/skewed, medium, rare, absent, mixed-case, >255
    ("term", "def"),
    ("term", "spark"),
    ("term", "merge"),
    ("term", "ident_0000"),
    ("term", "ident_0100"),
    ("term", "ident_2000"),
    ("term", "ident_4900"),
    ("term", "zzz_absent"),
    ("term", "SPARK"),
    ("term", LONG_CHUNK),
    # --- bool_or (8): 2-5 clauses
    ("bool_or", "content:(def OR class)"),
    ("bool_or", "spark OR merge OR query"),
    ("bool_or", "ident_0000 OR ident_0001 OR ident_0002 OR ident_0003"),
    ("bool_or", "def OR ident_4900"),
    ("bool_or", "zzz_absent OR ident_2000"),
    ("bool_or", "return OR import OR public OR static OR void"),
    ("bool_or", "val OR var OR lambda"),
    ("bool_or", "index OR segment OR posting OR token OR score"),
    # --- bool_and (5)
    ("bool_and", "def AND class"),
    ("bool_and", "spark AND index AND query"),
    ("bool_and", "ident_0000 AND def"),
    ("bool_and", "def AND zzz_absent"),
    ("bool_and", "for AND while AND if AND else"),
    # --- bool_mixed (4)
    ("bool_mixed", "def AND NOT class"),
    ("bool_mixed", "spark OR merge NOT query"),
    ("bool_mixed", "(val OR var) AND NOT (lambda OR def)"),
    ("bool_mixed", "NOT def"),
    # --- multiterm / boost / sloppy (10): round-1 query-surface pins
    ("prefix", "spar*"),
    ("prefix", "ident_00*"),
    ("wildcard", "id?nt_0001"),
    ("wildcard", "*_4900"),
    ("fuzzy", "spark~1"),
    ("fuzzy", "merg~2"),
    ("regexp", "/sp[aeiou]rk/"),
    ("range", "[spark TO spars]"),
    ("boost", "spark^2 OR merge"),
    ("sloppy", '"def class"~3'),
]


def main():
    corpus = synth_corpus_local(N_DOCS, SEED)
    docs = list(zip(corpus["doc_id"].tolist(), corpus["content"].tolist()))
    oracle = OracleIndex(docs)

    # pick 3 phrases deterministically: the 2 most common bigrams + one
    # 3-gram built from the most common bigram's continuation
    bigrams: Counter = Counter()
    trigrams: Counter = Counter()
    for _, text in docs:
        toks = tokenize(text)
        for a, b in zip(toks, toks[1:]):
            bigrams[(a, b)] += 1
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            trigrams[(a, b, c)] += 1
    top_bi = sorted(bigrams.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    top_tri = sorted(trigrams.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    phrase_queries = [
        ("phrase", f'"{a} {b}"') for (a, b), _ in top_bi
    ] + [("phrase", '"%s %s %s"' % top_tri[0])]

    all_queries = FIXED_QUERIES + phrase_queries
    assert len(all_queries) == 40

    queries_json = [
        {"query_id": i + 1, "kind": kind, "text": text, "k": KS}
        for i, (kind, text) in enumerate(all_queries)
    ]

    golden = []
    for q in queries_json:
        for k in KS:
            td = oracle.search(q["text"], k=k)
            golden.append({
                "query_id": q["query_id"],
                "k": k,
                "total_hits": td.total_hits,
                "score_docs": [[int(d), float(s)] for d, s in td.score_docs],
            })

    os.makedirs(FIXDIR, exist_ok=True)
    with open(os.path.join(FIXDIR, "queries.json"), "w") as fh:
        json.dump({"n_docs": N_DOCS, "seed": SEED, "queries": queries_json}, fh, indent=1)
    with open(os.path.join(FIXDIR, "golden_topdocs.json"), "w") as fh:
        json.dump(golden, fh, indent=1)
    n_nonempty = sum(1 for g in golden if g["score_docs"])
    print(f"wrote {len(queries_json)} queries, {len(golden)} golden TopDocs "
          f"({n_nonempty} non-empty) to {FIXDIR}")
    for q in queries_json:
        td = oracle.search(q["text"], k=10)
        print(f"  q{q['query_id']:02d} [{q['kind']:10s}] {q['text'][:60]!r:62s} hits={td.total_hits}")


if __name__ == "__main__":
    main()
