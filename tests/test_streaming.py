"""Structured Streaming operators: incremental index build (UpdateStream
/ NRT analog), topic delivery, windowed daemon rollup with watermark."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.build import build_index, read_manifest
from lucene_solr_spark.operators.search import IndexReader
from lucene_solr_spark.sources import SOURCE_SCHEMA, load_source_table
from lucene_solr_spark.streaming import daemon_counts, incremental_index, topic_stream

STREAM_SCHEMA = "doc_id long, repo string, path string, commit string, lang string, content string"


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_source_table(spark, sf_dir).cache()


def test_incremental_index_equals_batch(spark, corpus, tmp_path):
    """Stream the corpus in two file drops; the incrementally built
    index must answer queries identically to a one-shot batch build."""
    src_dir = str(tmp_path / "incoming")
    idx_dir = str(tmp_path / "idx_stream")
    ckpt = str(tmp_path / "ckpt")
    # drop 1: first half
    corpus.filter(F.col("doc_id") < 256).write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema(STREAM_SCHEMA).parquet(src_dir)
    q = incremental_index(spark, stream, idx_dir, ckpt, docs_per_seg=128)
    q.awaitTermination(120)
    m1 = read_manifest(idx_dir)
    assert m1 is not None and m1.seg_ids == [0, 1]

    # drop 2: the rest arrives later
    corpus.filter(F.col("doc_id") >= 256).write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema(STREAM_SCHEMA).parquet(src_dir)
    q = incremental_index(spark, stream, idx_dir, ckpt, docs_per_seg=128)
    q.awaitTermination(120)
    m2 = read_manifest(idx_dir)
    assert set(m2.seg_ids) > set(m1.seg_ids)

    batch_dir = str(tmp_path / "idx_batch")
    build_index(spark, corpus, batch_dir, docs_per_seg=128)
    r_stream, r_batch = IndexReader(spark, idx_dir), IndexReader(spark, batch_dir)
    for query in ["spark", "spark OR merge OR vector", "hash AND join",
                  '"batch batch"', "spar*"]:
        assert r_stream.search_with_total(query, k=20) == \
            r_batch.search_with_total(query, k=20), query


def test_incremental_replay_is_idempotent(spark, corpus, tmp_path):
    """Replaying the same input (fresh checkpoint, same files) must not
    duplicate or recompute committed segments."""
    src_dir = str(tmp_path / "incoming")
    idx_dir = str(tmp_path / "idx")
    corpus.filter(F.col("doc_id") < 256).write.mode("append").parquet(src_dir)
    for i in range(2):  # second pass = full replay with a NEW checkpoint
        stream = spark.readStream.schema(STREAM_SCHEMA).parquet(src_dir)
        q = incremental_index(spark, stream, idx_dir, str(tmp_path / f"ck{i}"),
                              docs_per_seg=128)
        q.awaitTermination(120)
    m = read_manifest(idx_dir)
    assert m.seg_ids == [0, 1]
    assert m.doc_count == 256


def test_topic_stream_delivers_matches(spark, corpus, tmp_path):
    src_dir = str(tmp_path / "topic_src")
    out_dir = str(tmp_path / "topic_out")
    corpus.limit(200).write.mode("append").parquet(src_dir)
    q = topic_stream(
        spark, src_dir, STREAM_SCHEMA,
        F.col("content").contains("spark"),
        out_dir, str(tmp_path / "topic_ck"),
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    expect = spark.read.parquet(src_dir).filter(F.col("content").contains("spark"))
    assert sorted(r["doc_id"] for r in got.collect()) == \
        sorted(r["doc_id"] for r in expect.collect())


def test_daemon_counts_matches_batch_rollup(spark, sf_dir, tmp_path):
    """Streaming windowed agg (availableNow over the events table) ==
    batch groupBy(window) on the same input."""
    events_dir = str(tmp_path / "events_src")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(events_dir)
    stream = spark.readStream.schema(
        spark.read.parquet(events_dir).schema
    ).parquet(events_dir)
    agg = daemon_counts(stream, "ts", "1 day", "1 hour",
                        F.count(F.lit(1)).alias("cnt"))
    out_dir = str(tmp_path / "daemon_out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "daemon_ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["bucket_start"], r["cnt"])
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = spark.read.parquet(events_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    expect = {
        (r["w"]["start"], r["cnt"])
        for r in batch.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    # append mode emits only windows closed by the watermark; with
    # availableNow + final watermark advance, all-but-the-last windows
    # flush — require a meaningful, correct subset
    assert got and got <= expect
    assert len(got) >= len(expect) - 1
