"""Segment merging: tiered policy (driver) + salted sorted-merge (executor).

Mirrors (SURVEY.md §2.3):
- `[U] lucene/core/.../index/TieredMergePolicy.java` — pick merges of
  ~equal-size segments, ``segsPerTier=10``, ``maxMergeAtOnce=10``.
  Simplification (documented): candidates are doc_base-ADJACENT runs,
  so every segment keeps a contiguous (doc_base, n_docs) range and the
  MatchAll/doc-universe arithmetic stays O(1) per segment. Lucene's
  skew-scored candidate selection degenerates to smallest-adjacent-run
  selection here.
- `[U] lucene/core/.../index/SegmentMerger.java` — because global
  doc_ids are assigned before segmenting and never remapped
  (SURVEY.md §1.1), merging posting lists is a doc-ordered concat +
  re-block, not a docID remap: strictly cheaper than the reference's
  MappedMultiFields machinery.
- north_star "salted repartition + sorted-merge": the shuffle key is
  (term_bucket, salt) where salt is the build-time hot-term shard id,
  so a hot term's merge work spreads over as many tasks as it had
  shards; the cheap final shard renumbering is a window over posting
  ROWS (one row per term x salt — metadata-sized, never postings-sized).

The commit is again manifest-gated: the new segment's parquet is
invisible until gen-N+1 lists it, and source segments simply stop being
listed (files deleted lazily via vacuum()).
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..functions.postings import (
    decode_docs,
    decode_norms,
    decode_positions_concat,
    decode_tfs,
    encode_posting_list,
)
from .build import (
    DEFAULT_SHARD_POSTINGS,
    Manifest,
    POSTINGS_SCHEMA,
    commit_manifest,
    read_manifest,
)

MERGED_POSTINGS_SCHEMA = POSTINGS_SCHEMA + ", first_doc_key long"

# merged-segment id namespace, disjoint from build ids (doc//docs_per_seg)
MERGE_SEG_BASE = 1_000_000_000


# ----------------------------------------------------------------- policy


def plan_merges(manifest: Manifest, segs_per_tier: int = 10,
                max_merge_at_once: int = 10) -> List[List[int]]:
    """TieredMergePolicy-lite: while more segments than segs_per_tier,
    merge the adjacent run (by doc_base) with the smallest total size."""
    segs = sorted(manifest.segments, key=lambda s: s["doc_base"])
    merges: List[List[int]] = []
    while len(segs) > segs_per_tier:
        width = min(max_merge_at_once, len(segs) - segs_per_tier + 1, len(segs))
        if width < 2:
            break
        best_i, best_size = 0, None
        for i in range(len(segs) - width + 1):
            size = sum(s["n_docs"] for s in segs[i : i + width])
            if best_size is None or size < best_size:
                best_i, best_size = i, size
        run = segs[best_i : best_i + width]
        merges.append([s["seg"] for s in run])
        merged_stub = {
            "seg": -1,
            "doc_base": run[0]["doc_base"],
            "n_docs": sum(s["n_docs"] for s in run),
        }
        segs = segs[:best_i] + [merged_stub] + segs[best_i + width:]
    return merges


# --------------------------------------------------------------- executor


def _merge_kernel_factory(new_seg: int, seg_order: Dict[int, int],
                          shard_postings: int = DEFAULT_SHARD_POSTINGS):
    """applyInPandas kernel over (term_bucket, salt): k-way doc-ordered
    merge of each term's posting rows across source segments."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        from .build import _POSTING_COLS

        out = {c: [] for c in _POSTING_COLS + ["seg", "first_doc_key"]}
        pdf = pdf.assign(_ord=pdf["seg"].map(seg_order))
        pdf = pdf.sort_values(["term", "_ord", "shard"], kind="mergesort")
        for term, g in pdf.groupby("term", sort=False):
            # doc ranges of source segs are disjoint and _ord-sorted, so
            # concatenating decoded rows in seg order IS the doc-sorted
            # merge; then re-encode (re-blocked at 128)
            rows = g.to_dict("records")
            docs = np.concatenate([decode_docs(r) for r in rows])
            tfs = np.concatenate([decode_tfs(r) for r in rows])
            norms = np.concatenate([decode_norms(r) for r in rows]).astype(np.int64)
            pos_concat = np.concatenate([
                decode_positions_concat(r, decode_tfs(r)) for r in rows
            ]) if int(tfs.sum()) else np.empty(0, np.int64)
            # re-delta positions: absolute at each posting start
            bounds = np.cumsum(tfs)
            starts = np.zeros(len(tfs), dtype=np.int64)
            starts[1:] = bounds[:-1]
            pos_delta = np.empty(len(pos_concat), dtype=np.int64)
            if len(pos_concat):
                pos_delta[0] = pos_concat[0]
                np.subtract(pos_concat[1:], pos_concat[:-1], out=pos_delta[1:])
                pos_delta[starts] = pos_concat[starts]
            row0 = g.iloc[0]
            n = len(docs)
            for shard_idx, s in enumerate(range(0, n, shard_postings)):
                e = min(s + shard_postings, n)
                p_lo = bounds[s - 1] if s else 0
                p_hi = bounds[e - 1]
                enc = encode_posting_list(
                    docs[s:e], tfs[s:e], norms[s:e],
                    pos_delta[p_lo:p_hi], bounds[s:e] - p_lo,
                )
                out["field"].append(row0["field"])
                out["term"].append(term)
                out["term_bucket"].append(int(row0["term_bucket"]))
                out["seg"].append(new_seg)
                out["shard"].append(shard_idx)  # renumbered later if salted
                out["df"].append(int(e - s))
                out["cum_tf"].append(int(tfs[s:e].sum()))
                out["max_tf"].append(int(tfs[s:e].max()))
                out["min_norm"].append(int(norms[s:e].min()))
                for k, v in enc.items():
                    out[k].append(v)
                out["first_doc_key"].append(int(docs[s]))
        return pd.DataFrame(out)

    return kernel


def merge_segments(spark: SparkSession, index_dir: str, seg_ids: Sequence[int],
                   shard_postings: int = DEFAULT_SHARD_POSTINGS) -> Manifest:
    """Merge ``seg_ids`` (doc_base-adjacent) into one new segment and
    commit a new manifest generation."""
    m = read_manifest(index_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest under {index_dir}")
    by_id = {s["seg"]: s for s in m.segments}
    missing = set(seg_ids) - set(by_id)
    if missing:
        raise ValueError(f"segments not in manifest: {sorted(missing)}")
    srcs = sorted((by_id[s] for s in seg_ids), key=lambda s: s["doc_base"])
    # merged segments live in a DISJOINT id namespace: build ids are
    # doc_id // docs_per_seg (< 1e9 up to ~4*10^12 docs at the default
    # segment size), so build resume after a merge can never collide
    new_seg = max(MERGE_SEG_BASE - 1, max(by_id)) + 1
    seg_order = {s["seg"]: i for i, s in enumerate(srcs)}

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    postings = spark.read.parquet(f"{index_dir}/postings").filter(
        F.col("seg").isin(list(seg_ids))
    )
    # salted repartition: salt = build-time hot-term shard id, so a hot
    # term's merge spreads across tasks (SURVEY.md §4.3)
    merged = (
        postings.withColumn("salt", F.col("shard"))
        .groupBy("term_bucket", "salt")
        .applyInPandas(_merge_kernel_factory(new_seg, seg_order, shard_postings),
                       schema=MERGED_POSTINGS_SCHEMA)
    )
    # shard renumbering per term in doc order (metadata-sized window)
    w = Window.partitionBy("term").orderBy("first_doc_key")
    merged = (
        merged.withColumn("shard", F.row_number().over(w) - F.lit(1))
        .drop("first_doc_key")
    )
    merged.sortWithinPartitions("term").write.mode("overwrite").partitionBy("seg").parquet(
        f"{index_dir}/postings"
    )

    docmeta = spark.read.parquet(f"{index_dir}/docmeta").filter(
        F.col("seg").isin(list(seg_ids))
    )
    docmeta.withColumn("seg", F.lit(new_seg)).write.mode("overwrite").partitionBy(
        "seg"
    ).parquet(f"{index_dir}/docmeta")

    n_terms = (
        spark.read.parquet(f"{index_dir}/postings")
        .filter(F.col("seg") == new_seg)
        .select(F.count_distinct("term").alias("n"))
        .collect()[0]["n"]
    )
    fp = 0
    for s in srcs:
        fp ^= int(s["input_fingerprint"], 16)
    pdir = os.path.join(index_dir, "postings", f"seg={new_seg}")
    postings_bytes = sum(
        os.path.getsize(os.path.join(pdir, f))
        for f in os.listdir(pdir) if f.endswith(".parquet")
    ) if os.path.isdir(pdir) else 0
    new_entry = {
        "seg": int(new_seg),
        "n_docs": sum(s["n_docs"] for s in srcs),
        "doc_base": srcs[0]["doc_base"],
        "sum_dl": sum(s["sum_dl"] for s in srcs),
        "n_terms": int(n_terms),
        "n_postings": sum(s["n_postings"] for s in srcs),
        "input_fingerprint": f"{fp:016x}",
        "postings_bytes": int(postings_bytes),
        "source": "merge(" + ",".join(str(s["seg"]) for s in srcs) + ")",
    }
    keep = [s for s in m.segments if s["seg"] not in set(seg_ids)]
    out = Manifest(
        gen=m.gen + 1, docs_per_seg=m.docs_per_seg, analyzer=m.analyzer,
        field=m.field, segments=sorted(keep + [new_entry], key=lambda s: s["seg"]),
    )
    commit_manifest(index_dir, out)
    return out


def force_merge(spark: SparkSession, index_dir: str,
                segs_per_tier: int = 10, max_merge_at_once: int = 10) -> Manifest:
    """Run the tiered policy to fixpoint (like forceMerge towards a
    budgeted segment count)."""
    m = read_manifest(index_dir)
    while True:
        merges = plan_merges(m, segs_per_tier, max_merge_at_once)
        if not merges:
            return m
        for group in merges:
            m = merge_segments(spark, index_dir, group)


def vacuum(index_dir: str) -> List[int]:
    """Delete parquet partition dirs of segments no longer in the
    manifest (Lucene's deleter keeps files until no commit references
    them; here the latest manifest is the only live commit)."""
    m = read_manifest(index_dir)
    live = set(m.seg_ids) if m else set()
    removed = []
    for sub in ("postings", "docmeta"):
        base = os.path.join(index_dir, sub)
        if not os.path.isdir(base):
            continue
        for entry in os.listdir(base):
            if entry.startswith("seg="):
                seg = int(entry.split("=", 1)[1])
                if seg not in live:
                    shutil.rmtree(os.path.join(base, entry))
                    removed.append(seg)
    return sorted(set(removed))
