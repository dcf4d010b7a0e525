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
    m = apply_update_commands(spark, d, [{"delete": {"id": 0}}])
    assert m is not None
    idx = IndexReader(spark, d)
    assert idx.count("merge") == 0
    apply_update_commands(spark, d, [{"delete": {"query": "vector"}}])
    idx = IndexReader(spark, d)
    assert idx.count("hash") == 0
    assert idx.count("spark") == 1  # doc 1 remains


def test_uncommitted_adds_dropped_and_errors(spark, tmp_path):
    d = _mk(spark, tmp_path)
    m = apply_update_commands(spark, d, [
        {"add": {"doc": {"repo": "r", "path": "x", "commit": "c",
                         "lang": "t", "content": "ghost"}}},
    ])
    assert m is None                       # no commit -> not visible
    assert IndexReader(spark, d).count("ghost") == 0
    with pytest.raises(ValueError):
        apply_update_commands(spark, d, [{"nope": {}}])
    with pytest.raises(ValueError):
        apply_update_commands(spark, d, [{"delete": {}}])
