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


def test_sessionize_stateful_across_restarts(spark, tmp_path):
    """applyInPandasWithState sessionization: closed sessions emit with
    exact bounds/counts, and the OPEN session survives a query restart
    through the state checkpoint."""
    from datetime import datetime, timedelta

    from lucene_solr_spark.streaming import sessionize

    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir, exist_ok=True)
    t0 = datetime(2024, 1, 1, 8, 0, 0)

    def write_batch(name, rows):
        spark.createDataFrame(rows, "user_id long, ts timestamp") \
            .coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/{name}")

    def run_once():
        stream = spark.readStream.schema("user_id long, ts timestamp") \
            .option("pathGlobFilter", "*.parquet") \
            .parquet(src_dir + "/*")
        q = sessionize(stream, "user_id", "ts", gap_seconds=600) \
            .writeStream.format("parquet").option("path", out_dir) \
            .option("checkpointLocation", ckpt).outputMode("append") \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)

    # batch 1: user 1 has two sessions separated by >10min; the second
    # stays OPEN (only closed sessions emit)
    write_batch("b1", [
        (1, t0), (1, t0 + timedelta(minutes=2)),
        (1, t0 + timedelta(minutes=30)),
        (2, t0),
    ])
    run_once()
    out = spark.read.parquet(out_dir)
    rows = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in out.collect()}
    assert rows == {(1, t0, t0 + timedelta(minutes=2), 2)}

    # batch 2 (new files, SAME checkpoint): user 1's open session is
    # continued from restored state, then closed by a later event;
    # user 2's single event closes too
    write_batch("b2", [
        (1, t0 + timedelta(minutes=35)),
        (1, t0 + timedelta(minutes=55)),
        (2, t0 + timedelta(minutes=40)),
    ])
    run_once()
    rows = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.read.parquet(out_dir).collect()}
    assert (1, t0 + timedelta(minutes=30), t0 + timedelta(minutes=35), 2) in rows
    assert (2, t0, t0, 1) in rows
