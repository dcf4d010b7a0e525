"""Solr /select facade tests (component-chain composition semantics)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.build import build_index
from lucene_solr_spark.operators.search import IndexReader
from lucene_solr_spark.operators.select import solr_select
from lucene_solr_spark.sources import load_source_table


@pytest.fixture(scope="module")
def idx(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("select") / "idx")
    build_index(spark, load_source_table(spark, sf_dir), d, docs_per_seg=128)
    return IndexReader(spark, d)


def test_pagination_is_coherent(idx):
    """Pages start=0,rows=10 and (start=0,rows=5)+(start=5,rows=5) must
    agree; positions are global ranks."""
    full = solr_select(idx, {"q": "spark OR merge", "rows": 10}).docs.collect()
    p1 = solr_select(idx, {"q": "spark OR merge", "rows": 5}).docs.collect()
    p2 = solr_select(idx, {"q": "spark OR merge", "start": 5, "rows": 5}).docs.collect()
    got = [(r["position"], r["doc_id"]) for r in p1 + p2]
    want = [(r["position"], r["doc_id"]) for r in full]
    assert got == want
    assert [r["position"] for r in full] == list(range(1, 11))


def test_fq_is_nonscoring_docset_intersection(idx):
    """fq filters the doc set but never changes scores (Solr filter
    cache semantics)."""
    base = {r["doc_id"]: r["score"] for r in
            solr_select(idx, {"q": "spark OR merge", "rows": 50}).docs.collect()}
    fqd = solr_select(idx, {"q": "spark OR merge", "fq": "join", "rows": 50})
    with_join = {r["doc_id"] for r in idx.termfreq("join").collect()}
    for r in fqd.docs.collect():
        assert r["doc_id"] in with_join
        if r["doc_id"] in base:
            assert np.float32(r["score"]) == np.float32(base[r["doc_id"]])
    assert fqd.num_found() <= len(base) or fqd.num_found() <= idx.doc_count


def test_sort_by_stored_field(idx):
    rows = solr_select(idx, {"q": "spark", "sort": "path desc",
                             "rows": 5, "fl": ["path"]}).docs.collect()
    paths = [r["path"] for r in rows]
    assert paths == sorted(paths, reverse=True)


def test_facets_count_filtered_match_set(idx, spark, sf_dir):
    resp = solr_select(idx, {"q": "spark OR merge", "fq": "join",
                             "facet.field": "lang"})
    facet = {r["lang"]: r["cnt"] for r in resp.facets["lang"].collect()}
    match_ids = {r["doc_id"] for r in resp.matches.select("doc_id").collect()}
    src = load_source_table(spark, sf_dir)
    want = {}
    for r in src.select("doc_id", "lang").collect():
        if r["doc_id"] in match_ids:
            want[r["lang"]] = want.get(r["lang"], 0) + 1
    assert facet == want
    assert sum(facet.values()) == resp.num_found()


def test_fq_on_stored_field(idx):
    """fq=lang:en filters via docmeta (Solr docValues fq), content fq
    still goes through the query parser."""
    resp = solr_select(idx, {"q": "spark OR merge", "fq": "lang:en",
                             "rows": 20, "fl": ["lang"]})
    rows = resp.docs.collect()
    assert rows and all(r["lang"] == "en" for r in rows)
    both = solr_select(idx, {"q": "spark OR merge",
                             "fq": ["lang:en", "join"], "rows": 20})
    with_join = {r["doc_id"] for r in idx.termfreq("join").collect()}
    assert all(r["doc_id"] in with_join for r in both.docs.collect())


def test_cursor_mark_pages_equal_offset_pages(idx):
    """Walking cursorMark pages reproduces exactly the offset-paged
    ranking, without ever sorting start+rows deep."""
    want = [r["doc_id"] for r in
            solr_select(idx, {"q": "spark OR merge", "rows": 12}).docs.collect()]
    got, cm = [], "*"
    for _ in range(3):
        r = solr_select(idx, {"q": "spark OR merge", "rows": 4,
                              "cursorMark": cm})
        page = r.docs.collect()
        got += [x["doc_id"] for x in page]
        assert [x["position"] for x in page] == list(range(1, len(page) + 1))
        cm = r.next_cursor_mark
    assert got == want
    # exhausted cursor: empty page, cursor echoes back (Solr contract)
    far = solr_select(idx, {"q": "spark OR merge", "rows": 10**6,
                            "cursorMark": "*"})
    end = solr_select(idx, {"q": "spark OR merge", "rows": 5,
                            "cursorMark": far.next_cursor_mark})
    assert end.docs.count() == 0
    assert end.next_cursor_mark == far.next_cursor_mark


def test_highlight_and_spellcheck_sections(idx, spark, sf_dir):
    """hl.fl produces snippets for page docs from the stored source;
    spellcheck returns DirectSpellChecker suggestions."""
    src = (load_source_table(spark, sf_dir)
           .select("doc_id", F.col("content").alias("text")))
    r = solr_select(idx, {"q": "spark", "rows": 5, "hl.fl": "text",
                          "spellcheck": True, "spellcheck.q": "sparc"},
                    source=src)
    hl = {x["doc_id"]: x["snippets"] for x in r.highlighting.collect()}
    page = [x["doc_id"] for x in r.docs.collect()]
    assert set(hl) == set(page)
    assert all(any("<em>spark</em>" in s for s in v) for v in hl.values())
    sugg = r.spellcheck.collect()
    assert sugg and "spark" in {x["term"] for x in sugg}


def test_deftype_edismax_routes_through_edismax_scorer(idx, spark, sf_dir,
                                                      tmp_path_factory):
    """defType=edismax through the facade == edismax_search directly."""
    from lucene_solr_spark.operators.edismax import edismax_search

    readers = {"content": idx}
    direct = [(r["doc_id"], round(float(r["score"]), 6)) for r in
              edismax_search(readers, "content", "spark merge",
                             tiebreak=0.2, mm=1, k=8).collect()]
    via = solr_select(idx, {"q": "spark merge", "defType": "edismax",
                            "qf": "content", "tie": 0.2, "mm": 1, "rows": 8},
                      readers=readers)
    got = [(r["doc_id"], round(float(r["score"]), 6))
           for r in via.docs.collect()]
    assert got == direct


def test_realtime_get_returns_latest_live_version(spark, tmp_path_factory):
    """/get answers with the replacement after updateDocument, with the
    original for untouched keys, and with nothing for deleted keys —
    via BOTH the literal point-lookup path and the batched-keys path."""
    from lucene_solr_spark.operators.delete import (delete_documents,
                                                    update_documents)
    from lucene_solr_spark.operators.select import realtime_get

    d = str(tmp_path_factory.mktemp("rtg") / "idx")
    src = spark.createDataFrame(
        [(i, "r", f"p{i}", "c", "t", f"doc number {i} spark") for i in range(6)],
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )
    build_index(spark, src, d, docs_per_seg=4)
    upd = spark.createDataFrame(
        [("r", "p2", "c2", "t", "replacement text two"),
         ("r", "p4", "c2", "t", "replacement text four")],
        "repo string, path string, commit string, lang string, content string",
    )
    update_documents(spark, d, upd)
    idx = IndexReader(spark, d)
    delete_documents(spark, d, idx.docmeta.filter(F.col("path") == "p5")
                     .select("doc_id"))
    idx = IndexReader(spark, d)

    # literal point lookups (pushdown predicate path)
    rows = {r["path"]: r for r in realtime_get(
        idx, [("r", "p1"), ("r", "p2"), ("r", "p5")], fl=("commit",)).collect()}
    assert rows["p1"]["doc_id"] == 1 and rows["p1"]["commit"] == "c"
    assert rows["p2"]["doc_id"] > 5 and rows["p2"]["commit"] == "c2"
    assert "p5" not in rows  # every version deleted -> absent

    # batched-keys DataFrame path agrees
    keys = spark.createDataFrame([("r", "p2"), ("r", "p4")],
                                 "repo string, path string")
    got = {r["path"]: r["doc_id"] for r in realtime_get(idx, keys).collect()}
    assert set(got) == {"p2", "p4"} and all(v > 5 for v in got.values())


def test_query_elevation(idx):
    """QEC semantics: config-order pins (score 0 when unmatched),
    exclusions vanish, rest keep score order."""
    from lucene_solr_spark.operators.select import query_elevation

    base = idx.search("spark OR merge", k=10)
    base_ids = [r["doc_id"] for r in
                base.orderBy(F.desc("score"), F.asc("doc_id")).collect()]
    # elevate one matching + one non-matching id; exclude the base top hit
    non_match = 10**9 + 7  # not a real doc: still pinned, score 0
    out = query_elevation(idx, "spark OR merge",
                          elevate_ids=(base_ids[3], non_match),
                          exclude_ids=(base_ids[0],), k=10).collect()
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    assert out[0]["doc_id"] == base_ids[3] and out[0]["elevated"]
    assert out[1]["doc_id"] == non_match and out[1]["score_r"] == 0.0
    rest = [r["doc_id"] for r in out[2:]]
    assert base_ids[0] not in rest          # excluded
    assert base_ids[3] not in rest          # not duplicated
    # rest preserves the base ordering with pins/excludes removed
    expect = [d for d in base_ids if d not in (base_ids[0], base_ids[3])]
    assert rest == expect[:len(rest)]


def test_local_params_filters(spark):
    """{!frange} bounds/inclusivity and {!terms} set membership."""
    from lucene_solr_spark.functions.funcparser import (
        FunctionQueryError, local_params_filter, parse_local_params)
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"), (4, 40.0, "b")],
        "id long, v double, tag string")
    got = {r["id"] for r in df.filter(local_params_filter(
        "{!frange l=10 u=30 incl=false}v")).collect()}
    assert got == {2, 3}  # l exclusive, u inclusive
    got = {r["id"] for r in df.filter(local_params_filter(
        "{!frange u=25}div(v,1)")).collect()}
    assert got == {1, 2}  # open lower bound, function body
    got = {r["id"] for r in df.filter(local_params_filter(
        "{!terms f=tag}b,c")).collect()}
    assert got == {2, 3, 4}
    # field-type-aware terms (TermsQParserPlugin): values are trimmed
    # and cast to the column's type when df is supplied — a numeric
    # field never relies on implicit string casts
    got = {r["id"] for r in df.filter(local_params_filter(
        "{!terms f=id}2 , 4", df=df)).collect()}
    assert got == {2, 4}
    got = {r["id"] for r in df.filter(local_params_filter(
        "{!terms f=v}20.0,30.0", df=df)).collect()}
    assert got == {2, 3}
    assert parse_local_params("{!terms f=x separator=|}1|2")[1]["separator"] == "|"
    with _pytest.raises(FunctionQueryError):
        local_params_filter("{!unknown}x")


def test_function_query_fields_from_ast():
    """Referenced-field detection is AST-derived: string literals and
    regex metacharacters in names don't confuse it."""
    from lucene_solr_spark.functions.funcparser import function_query_fields

    assert function_query_fields("product(price,sub(qty,2))") == {
        "price", "qty"}
    # a field-like word inside a string literal is NOT a reference
    assert function_query_fields('strdist(tag,"price")') == {"tag"}
    assert function_query_fields("abs(sub(a_b,1.5))") == {"a_b"}


def test_sort_by_function_query(idx):
    from lucene_solr_spark.operators.select import solr_select

    resp = solr_select(idx, {"q": "spark", "sort": "abs(sub(doc_id,50)) asc",
                             "rows": 5, "fl": ["doc_id"]})
    rows = resp.docs.collect()
    ids = [r["doc_id"] for r in rows]
    # closest-to-50 first, doc_id tiebreak; verify against the match set
    all_ids = [r["doc_id"] for r in resp.matches.collect()]
    exp = sorted(all_ids, key=lambda i: (abs(i - 50), i))[:5]
    assert ids == exp
    assert [r["position"] for r in rows] == [1, 2, 3, 4, 5]


def test_response_wire_format(idx):
    from lucene_solr_spark.operators.select import solr_select

    resp = solr_select(idx, {"q": "spark", "rows": 3, "fl": ["doc_id", "lang"],
                             "facet.field": "lang"})
    body = resp.response()
    assert body["responseHeader"]["status"] == 0
    assert body["response"]["numFound"] == resp.num_found()
    assert len(body["response"]["docs"]) == 3
    assert all("doc_id" in d and "position" in d for d in body["response"]["docs"])
    ff = body["facet_counts"]["facet_fields"]["lang"]
    assert len(ff) % 2 == 0 and isinstance(ff[1], int)   # flat [val, cnt, ...]
    import json
    json.dumps(body)   # the body must be JSON-serializable end-to-end


def test_total_hits_relation(idx):
    """TotalHits contract (Lucene 8): exact EQUAL_TO at/below the
    threshold, GREATER_THAN_OR_EQUAL_TO above it; the wire envelope
    surfaces numFoundExact (Solr 8.6+)."""
    from lucene_solr_spark.operators.select import solr_select

    r = solr_select(idx, {"q": "spark OR merge", "rows": 2})
    n = r.num_found()
    assert n > 1
    assert r.total_hits(threshold=n) == (n, "EQUAL_TO")
    assert r.total_hits(threshold=n - 1) == (n, "GREATER_THAN_OR_EQUAL_TO")
    body = r.response(total_hits_threshold=n - 1)
    assert body["response"]["numFound"] == n
    assert body["response"]["numFoundExact"] is False
    body = r.response()
    assert body["response"]["numFoundExact"] is True


def test_elevation_facade_guards(idx):
    """QEC params compose only with the relevancy sort and never with
    cursorMark; excludeIds alone works under any sort."""
    from lucene_solr_spark.operators.select import solr_select

    with pytest.raises(ValueError):
        solr_select(idx, {"q": "spark", "elevateIds": "7",
                          "sort": "path asc"})
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "spark", "elevateIds": "7",
                          "cursorMark": "*"})
    # excludeIds under a field sort: excluded doc vanishes, sort holds
    base = solr_select(idx, {"q": "spark", "sort": "path desc",
                             "rows": 3}).docs.collect()
    excl = solr_select(idx, {"q": "spark", "sort": "path desc", "rows": 3,
                             "excludeIds": str(base[0]["doc_id"])})
    got = [r["doc_id"] for r in excl.docs.collect()]
    assert base[0]["doc_id"] not in got
    assert got[0] == base[1]["doc_id"]


def test_multiselect_facet_tag_exclusion(idx):
    """{!tag}/{!ex}: the excluded facet's domain lifts the tagged fq
    (counts span all langs) while untagged facets and the match set
    still honor every fq (Solr SimpleFacets excludeTags)."""
    from lucene_solr_spark.operators.select import solr_select

    r = solr_select(idx, {
        "q": "spark OR merge", "fq": ["{!tag=LF}lang:en", "join"],
        "facet.field": ["{!ex=LF}lang", "lang"], "rows": 5,
        "fl": ["lang"]})
    # NOTE: both facet specs resolve to field 'lang'; dict keying means
    # the later (non-excluded) spec wins — so assert via separate calls
    rx = solr_select(idx, {
        "q": "spark OR merge", "fq": ["{!tag=LF}lang:en", "join"],
        "facet.field": "{!ex=LF}lang"})
    rn = solr_select(idx, {
        "q": "spark OR merge", "fq": ["{!tag=LF}lang:en", "join"],
        "facet.field": "lang"})
    ex_counts = {x["lang"]: x["cnt"] for x in rx.facets["lang"].collect()}
    in_counts = {x["lang"]: x["cnt"] for x in rn.facets["lang"].collect()}
    assert set(in_counts) == {"en"}          # fq respected
    assert len(ex_counts) > 1                # fq lifted for this facet
    assert ex_counts["en"] == in_counts["en"]  # same en count either way
    # the PAGE always honors every fq, exclusion affects facets only
    assert all(x["lang"] == "en" for x in r.docs.collect())


def test_select_complexphrase(spark, tmp_path):
    """{!complexphrase} through /select: wildcard slots expand at
    search time; inOrder=false is rejected."""
    import pytest as _pytest

    from lucene_solr_spark.operators.build import build_index
    from lucene_solr_spark.operators.search import IndexReader
    from lucene_solr_spark.operators.select import solr_select

    docs = [(0, "john smith here"), (1, "joan smyth here"),
            (2, "smith john here")]
    df = spark.createDataFrame(
        [(i, t, "r", f"p/{i}", "c", "en") for i, t in docs],
        "doc_id long, content string, repo string, path string, "
        "commit string, lang string")
    d = str(tmp_path / "cpsel")
    build_index(spark, df, d, docs_per_seg=2)
    idx = IndexReader(spark, d)

    resp = solr_select(idx, {"q": '{!complexphrase}content:"jo* sm*"',
                             "rows": 5})
    got = sorted(r["doc_id"] for r in resp.docs.collect())
    assert got == [0, 1]      # ordered adjacency: doc 2 reversed
    with _pytest.raises(ValueError):
        solr_select(idx, {"q": '{!complexphrase inOrder=false}"a b"'})
