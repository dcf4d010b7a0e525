"""spark-submit entry point (north_star: `spark-submit --py-files` run).

Builds an index over a parquet corpus and runs the query set, with the
engine shipped as a --py-files zip (how the job reaches real executors
at cluster scale — no repo checkout on workers):

    python tools/package_engine.py                     # -> /tmp/lucene_solr_spark.zip
    spark-submit --master 'local[8]' \
        --py-files /tmp/lucene_solr_spark.zip \
        tools/submit_job.py --corpus <dir> --index-dir <dir> [--query 'spark OR merge']

Inside spark-submit the SparkSession already exists (getOrCreate joins
it) and `lucene_solr_spark` imports from the shipped zip.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--docs-per-seg", type=int, default=1024)
    ap.add_argument("--query", default="content:(spark OR merge OR vector)")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lucene-solr-spark-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from lucene_solr_spark.operators.build import build_index
    from lucene_solr_spark.operators.search import IndexReader

    t0 = time.perf_counter()
    manifest = build_index(
        spark, spark.read.parquet(args.corpus), args.index_dir,
        docs_per_seg=args.docs_per_seg,
    )
    build_sec = time.perf_counter() - t0

    idx = IndexReader(spark, args.index_dir)
    t0 = time.perf_counter()
    top = idx.search(args.query, k=args.k).collect()
    query_sec = time.perf_counter() - t0

    print(json.dumps({
        "n_docs": manifest.doc_count,
        "n_segments": len(manifest.seg_ids),
        "build_sec": round(build_sec, 2),
        "docs_per_sec": round(manifest.doc_count / build_sec, 1),
        "query_sec": round(query_sec, 2),
        "top": [(int(r["doc_id"]), round(float(r["score"]), 4)) for r in top],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
