"""/update JSON command envelope -> engine lifecycle ops."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.build import build_index
from lucene_solr_spark.operators.search import IndexReader
from lucene_solr_spark.operators.updatejson import apply_update_commands


def _mk(spark, tmp_path):
    src = spark.createDataFrame(
        [(0, "r", "a", "c", "t", "spark merge"),
         (1, "r", "b", "c", "t", "spark sort"),
         (2, "r", "c", "c", "t", "vector hash")],
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string")
    d = str(tmp_path / "uj")
    build_index(spark, src, d, docs_per_seg=4)
    return d


def test_add_commit_overwrites_by_key(spark, tmp_path):
    d = _mk(spark, tmp_path)
    m = apply_update_commands(spark, d, [
        {"add": {"doc": {"repo": "r", "path": "b", "commit": "c2",
                         "lang": "t", "content": "replaced text"}}},
        {"add": {"doc": {"repo": "r", "path": "new", "commit": "c2",
                         "lang": "t", "content": "brand new spark"}}},
        {"commit": {}},
    ])
    assert m is not None
    idx = IndexReader(spark, d)
    # old (r, b) doc is tombstoned; its term 'sort' is gone from live
    live = idx.search("sort", k=10).collect()
    assert live == []
    # the new docs are searchable
    assert idx.count("replaced") == 1
    assert idx.count("brand") == 1


def test_delete_by_id_and_query(spark, tmp_path):
    d = _mk(spark, tmp_path)
    m = apply_update_commands(spark, d,
                              [{"delete": {"id": 0}}, {"commit": {}}])
    assert m is not None
    idx = IndexReader(spark, d)
    assert idx.count("merge") == 0
    apply_update_commands(spark, d,
                          [{"delete": {"query": "vector"}}, {"commit": {}}])
    idx = IndexReader(spark, d)
    assert idx.count("hash") == 0
    assert idx.count("spark") == 1  # doc 1 remains


def test_uncommitted_work_dropped_and_errors(spark, tmp_path):
    d = _mk(spark, tmp_path)
    m = apply_update_commands(spark, d, [
        {"add": {"doc": {"repo": "r", "path": "x", "commit": "c",
                         "lang": "t", "content": "ghost"}}},
    ])
    assert m is None                       # no commit -> not visible
    assert IndexReader(spark, d).count("ghost") == 0
    # uncommitted DELETES are dropped too (JsonLoader durability is
    # commit-gated for the whole command log, not just adds)
    m = apply_update_commands(spark, d, [{"delete": {"id": 0}}])
    assert m is None
    assert IndexReader(spark, d).count("merge") == 1
    with pytest.raises(ValueError):
        apply_update_commands(spark, d, [{"nope": {}}])
    with pytest.raises(ValueError):
        apply_update_commands(spark, d, [{"delete": {}}, {"commit": {}}])


def test_add_then_delete_same_doc_stays_deleted(spark, tmp_path):
    """JsonLoader applies commands in order: [{add X}, {delete X.id},
    {commit}] must NOT resurrect X (the delete fences the add batch)."""
    d = _mk(spark, tmp_path)
    m = apply_update_commands(spark, d, [
        {"add": {"doc": {"repo": "r", "path": "a", "commit": "c2",
                         "lang": "t", "content": "revived spark"}}},
        {"delete": {"query": "revived"}},
        {"commit": {}},
    ])
    assert m is not None
    idx = IndexReader(spark, d)
    assert idx.count("revived") == 0       # the later delete wins
    # and the reverse order resurrects: delete first, then re-add
    m = apply_update_commands(spark, d, [
        {"delete": {"id": 2}},
        {"add": {"doc": {"repo": "r", "path": "c", "commit": "c3",
                         "lang": "t", "content": "vector reborn"}}},
        {"commit": {}},
    ])
    idx = IndexReader(spark, d)
    assert idx.count("reborn") == 1


def test_xml_update_loader_roundtrip(spark, tmp_path):
    """XMLLoader envelope: <add><doc><field>…, <delete>, <commit/> parse
    into the SAME ordered command list as the JSON path and drive the
    identical lifecycle (`[U] solr/core/.../handler/loader/
    XMLLoader.java`)."""
    from lucene_solr_spark.sources import parse_xml_update

    cmds = parse_xml_update(
        '<update>'
        '<add><doc><field name="repo">r</field><field name="path">b</field>'
        '<field name="commit">c2</field><field name="lang">t</field>'
        '<field name="content">replaced via xml</field></doc></add>'
        '<delete><id>2</id></delete>'
        '<commit/>'
        '</update>')
    assert cmds[-1] == {"commit": {}}
    assert cmds[1] == {"delete": {"id": 2}}
    d = _mk(spark, tmp_path)
    m = apply_update_commands(spark, d, cmds)
    assert m is not None
    idx = IndexReader(spark, d)
    assert idx.count("xml") == 1          # the add landed
    assert idx.count("vector") == 0       # doc 2 deleted
    assert idx.count("sort") == 0         # (r, b) overwritten by key
    # multiValued: repeated field names collect into a list
    c2 = parse_xml_update('<add><doc><field name="tag">a</field>'
                          '<field name="tag">b</field></doc></add>')
    assert c2[0]["add"]["doc"]["tag"] == ["a", "b"]
    with pytest.raises(ValueError):
        parse_xml_update("<nope/>")
