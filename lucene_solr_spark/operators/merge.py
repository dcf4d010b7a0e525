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
- north_star "salted repartition + sorted-merge" / hot-term skew:
  already-sharded (hot) terms bypass the merge kernel entirely — their
  rows are doc-contiguous and block-valid as-is, so they pass through
  as a pure-JVM projection (the heaviest rows never concentrate in any
  shuffle group). Cold terms shuffle by term_bucket (1024-way spread),
  where each group sees EVERY row of its terms so concat + re-shard
  yields disjoint, ordered doc ranges per output row. The cheap final
  shard renumbering is a window over posting ROWS (one row per term x
  shard — metadata-sized, never postings-sized).

The commit is again manifest-gated: the new segment's parquet is
invisible until gen-N+1 lists it, and source segments simply stop being
listed (files deleted lazily via vacuum()).
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Optional, Sequence

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


def _ragged_gather(buf: bytes, lo: np.ndarray, hi: np.ndarray) -> bytes:
    """Concatenate buf[lo[i]:hi[i]] slices, fully vectorized."""
    lens = (hi - lo).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return b""
    arr = np.frombuffer(buf, dtype=np.uint8)
    base = np.repeat(lo, lens)
    local = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens)
    return arr[base + local].tobytes()


def _merge_kernel_factory(new_seg: Optional[int], seg_order: Dict[int, int],
                          shard_postings: int = DEFAULT_SHARD_POSTINGS,
                          deleted: Optional[np.ndarray] = None):
    """applyInPandas kernel over term_bucket groups of COLD (nowhere
    sharded) terms — each group holds every row of its terms: k-way
    doc-ordered merge of each term's posting rows across source
    segments, fully batched:

    - tf / pos / norms blobs are BYTE-CONCATENATED, never re-encoded —
      a varint stream whose per-posting values reset at posting starts
      concatenates into another valid stream, and value-boundary byte
      offsets come from one flag scan (varint_value_offsets);
    - only DOC deltas are re-encoded (block boundaries move), in ONE
      batched decode + ONE batched encode per task group, mirroring the
      build kernel's single-pass structure.

    ``deleted`` (sorted doc_ids): the expungeDeletes path (`[U]
    .../index/IndexWriter.java :: forceMergeDeletes`) — tombstoned
    postings are DROPPED before re-gridding. tf/pos streams are
    per-posting self-contained (values reset at posting starts), so the
    purge is a vectorized ragged byte-gather of the kept postings, not
    a re-encode; doc deltas are re-encoded anyway.
    """
    deleted = np.empty(0, np.int64) if deleted is None else deleted

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions.varint import (
            decode_varint,
            encode_varint_with_lengths,
            varint_value_offsets,
        )
        from .build import BLOCK_SIZE, _POSTING_COLS

        out = {c: [] for c in _POSTING_COLS + ["seg", "first_doc_key"]}
        if not len(pdf):
            return pd.DataFrame(out)
        cols = {c: pdf[c].to_numpy() for c in pdf.columns}
        # multi-group pass (merge_many): the target segment id rides in
        # on the grouping column instead of the factory closure
        seg_target = (int(cols["__target"][0]) if new_seg is None
                      else new_seg)
        t_codes, t_uniq = pd.factorize(cols["term"], sort=False)
        ord_arr = np.fromiter(
            (seg_order[s] for s in cols["seg"]), dtype=np.int64, count=len(pdf))
        idx = np.lexsort((cols["shard"], ord_arr, t_codes))

        df_r = cols["df"][idx].astype(np.int64)
        c_sorted = t_codes[idx]
        row_t_starts = np.flatnonzero(np.r_[True, np.diff(c_sorted) != 0])
        row_t_ends = np.append(row_t_starts[1:], len(c_sorted))

        # posting-space offsets per row / per term
        row_off = np.zeros(len(idx) + 1, dtype=np.int64)
        np.cumsum(df_r, out=row_off[1:])
        n_post = int(row_off[-1])
        term_starts = row_off[row_t_starts]
        term_ends = row_off[row_t_ends]
        # per-term metadata resolved from ROW space before any purge
        term_names = [t_uniq[c_sorted[s]] for s in row_t_starts]
        term_buckets = cols["term_bucket"][idx][row_t_starts].astype(np.int64)

        # batched decode of doc ids (absolute resets at original block
        # starts make the concatenated stream self-describing)
        docs_cat = b"".join(cols["docs"][i] for i in idx)
        d = decode_varint(docs_cat)
        blk_n_all = np.concatenate([
            np.asarray(cols["blk_n"][i], dtype=np.int64) for i in idx])
        ob_starts = np.zeros(len(blk_n_all), dtype=np.int64)
        ob_starts[1:] = np.cumsum(blk_n_all)[:-1]
        csum = np.cumsum(d)
        corr = np.zeros(len(blk_n_all), dtype=np.int64)
        corr[1:] = csum[ob_starts[1:] - 1]
        docs_all = csum - np.repeat(corr, blk_n_all)

        # tf values (needed for stats + position boundaries); blob bytes reused
        tfs_cat = b"".join(cols["tfs"][i] for i in idx)
        tf_all = decode_varint(tfs_cat)
        tf_boff = varint_value_offsets(tfs_cat)          # n_post+1
        pos_cat = b"".join(cols["pos"][i] for i in idx)
        pos_boff = varint_value_offsets(pos_cat)         # n_positions+1
        norms_cat = b"".join(cols["norms"][i] for i in idx)
        norms_all = np.frombuffer(norms_cat, dtype=np.uint8).astype(np.int64)
        pos_excl = np.zeros(n_post + 1, dtype=np.int64)
        np.cumsum(tf_all, out=pos_excl[1:])
        # per-POSTING pos byte offsets (n_post+1): downstream slicing
        # only ever needs posting-boundary offsets
        pos_poff = pos_boff[pos_excl]

        if deleted.size:
            di = np.searchsorted(deleted, docs_all)
            dic = np.minimum(di, len(deleted) - 1)
            keep = ~((di < len(deleted)) & (deleted[dic] == docs_all))
            if not keep.all():
                t_sizes = term_ends - term_starts
                t_id = np.repeat(np.arange(len(term_starts)), t_sizes)[keep]
                tfs_cat = _ragged_gather(tfs_cat, tf_boff[:-1][keep],
                                         tf_boff[1:][keep])
                pos_cat = _ragged_gather(pos_cat, pos_poff[:-1][keep],
                                         pos_poff[1:][keep])
                tf_lens = (tf_boff[1:] - tf_boff[:-1])[keep]
                pos_lens = (pos_poff[1:] - pos_poff[:-1])[keep]
                docs_all = docs_all[keep]
                tf_all = tf_all[keep]
                norms_all = norms_all[keep]
                norms_cat = norms_all.astype(np.uint8).tobytes()
                n_post = len(docs_all)
                tf_boff = np.zeros(n_post + 1, dtype=np.int64)
                np.cumsum(tf_lens, out=tf_boff[1:])
                pos_poff = np.zeros(n_post + 1, dtype=np.int64)
                np.cumsum(pos_lens, out=pos_poff[1:])
                pos_excl = np.zeros(n_post + 1, dtype=np.int64)
                np.cumsum(tf_all, out=pos_excl[1:])
                counts = np.bincount(t_id, minlength=len(term_starts))
                nz = np.flatnonzero(counts)
                if nz.size == 0:
                    return pd.DataFrame(out)
                term_names = [term_names[i] for i in nz]
                term_buckets = term_buckets[nz]
                sizes_nz = counts[nz]
                term_ends = np.cumsum(sizes_nz)
                term_starts = term_ends - sizes_nz
                if n_post == 0:
                    return pd.DataFrame(out)

        # new 128-block grid per term (shard boundaries align: multiple
        # of BLOCK_SIZE)
        nb = (term_ends - term_starts + BLOCK_SIZE - 1) // BLOCK_SIZE
        blk_of_term = np.repeat(np.arange(len(term_starts)), nb)
        blk_local = np.arange(int(nb.sum()), dtype=np.int64) - \
            np.repeat(np.cumsum(nb) - nb, nb)
        b_starts = term_starts[blk_of_term] + blk_local * BLOCK_SIZE
        b_ends = np.minimum(b_starts + BLOCK_SIZE, term_ends[blk_of_term])
        blk_bounds = np.zeros(len(term_starts) + 1, dtype=np.int64)
        np.cumsum(nb, out=blk_bounds[1:])

        # re-encode ONLY doc deltas, reset at the new block starts
        ddel = np.empty(n_post, dtype=np.int64)
        ddel[0] = docs_all[0]
        np.subtract(docs_all[1:], docs_all[:-1], out=ddel[1:])
        ddel[b_starts] = docs_all[b_starts]
        docs_buf, dlen = encode_varint_with_lengths(ddel)
        dboff = np.zeros(n_post + 1, dtype=np.int64)
        np.cumsum(dlen, out=dboff[1:])

        blk_first_g = docs_all[b_starts]
        blk_last_g = docs_all[b_ends - 1]
        blk_n_g = (b_ends - b_starts).astype(np.int32)
        blk_max_tf_g = np.maximum.reduceat(tf_all, b_starts).astype(np.int32)
        blk_min_norm_g = np.minimum.reduceat(norms_all, b_starts).astype(np.int32)
        cum_tf_t = np.add.reduceat(tf_all, term_starts)
        max_tf_t = np.maximum.reduceat(tf_all, term_starts)
        min_norm_t = np.minimum.reduceat(norms_all, term_starts)

        field0 = cols["field"][0]
        for t in range(len(term_starts)):
            ts, te = int(term_starts[t]), int(term_ends[t])
            term = term_names[t]
            b0, b1 = int(blk_bounds[t]), int(blk_bounds[t + 1])
            if te - ts <= shard_postings:
                shard_ranges = [(ts, te, b0, b1, 0)]
            else:
                shard_ranges = []
                bps = shard_postings // BLOCK_SIZE
                for si, s0 in enumerate(range(ts, te, shard_postings)):
                    e0 = min(s0 + shard_postings, te)
                    sb0 = b0 + si * bps
                    sb1 = min(sb0 + bps, b1)
                    shard_ranges.append((s0, e0, sb0, sb1, si))
            for (s0, e0, sb0, sb1, si) in shard_ranges:
                d_lo, t_lo = dboff[s0], tf_boff[s0]
                p_lo = pos_poff[s0]
                out["field"].append(field0)
                out["term"].append(term)
                out["term_bucket"].append(int(term_buckets[t]))
                out["seg"].append(seg_target)
                out["shard"].append(si)
                out["df"].append(int(e0 - s0))
                out["cum_tf"].append(int(cum_tf_t[t]) if len(shard_ranges) == 1
                                     else int(tf_all[s0:e0].sum()))
                out["max_tf"].append(int(max_tf_t[t]) if len(shard_ranges) == 1
                                     else int(tf_all[s0:e0].max()))
                out["min_norm"].append(int(min_norm_t[t]) if len(shard_ranges) == 1
                                       else int(norms_all[s0:e0].min()))
                out["blk_first"].append(blk_first_g[sb0:sb1].tolist())
                out["blk_last"].append(blk_last_g[sb0:sb1].tolist())
                out["blk_n"].append(blk_n_g[sb0:sb1].tolist())
                out["blk_max_tf"].append(blk_max_tf_g[sb0:sb1].tolist())
                out["blk_min_norm"].append(blk_min_norm_g[sb0:sb1].tolist())
                out["blk_doc_off"].append(
                    (dboff[b_starts[sb0:sb1]] - d_lo).astype(np.int32).tolist())
                out["blk_tf_off"].append(
                    (tf_boff[b_starts[sb0:sb1]] - t_lo).astype(np.int32).tolist())
                out["blk_pos_off"].append(
                    (pos_poff[b_starts[sb0:sb1]] - p_lo).astype(np.int32).tolist())
                out["docs"].append(docs_buf[d_lo:dboff[e0]])
                out["tfs"].append(tfs_cat[t_lo:tf_boff[e0]])
                out["pos"].append(pos_cat[p_lo:pos_poff[e0]])
                out["norms"].append(norms_cat[s0:e0])
                out["first_doc_key"].append(int(docs_all[s0]))
        return pd.DataFrame(out)

    return kernel


def merge_segments(spark: SparkSession, index_dir: str, seg_ids: Sequence[int],
                   shard_postings: int = DEFAULT_SHARD_POSTINGS,
                   purge_deleted: bool = False) -> Manifest:
    """Merge ``seg_ids`` (doc_base-adjacent) into one new segment and
    commit a new manifest generation (thin wrapper over merge_many)."""
    return merge_many(spark, index_dir, [list(seg_ids)], shard_postings,
                      purge_deleted)


def merge_many(spark: SparkSession, index_dir: str,
               groups: Sequence[Sequence[int]],
               shard_postings: int = DEFAULT_SHARD_POSTINGS,
               purge_deleted: bool = False) -> Manifest:
    """Execute a whole MERGE WAVE — several disjoint groups of
    doc_base-adjacent segments — in ONE distributed pass: every source
    row maps to its target segment id, the kernel runs grouped by
    (target, term_bucket), and there is a single postings write, a
    single docmeta write, and ONE manifest commit. At 1000 executors a
    tier's worth of merges is one job instead of len(groups) sequential
    job chains.

    ``shard_postings`` is rounded UP to a multiple of the 128-doc block
    size (shard boundaries must fall on block boundaries).

    ``purge_deleted``: physically drop tombstoned docs from postings +
    docmeta (expungeDeletes). Entries then record live counts
    (``n_live``/``sum_dl_live``) which collection statistics use, while
    ``n_docs``/``doc_base`` keep the ORIGINAL doc range — MatchAll
    enumeration still walks the range and masks with the retained
    tombstones, so queries need no special case.
    """
    from .build import BLOCK_SIZE

    deleted_arr = None
    if purge_deleted:
        from .delete import load_deleted_ids

        pre = read_manifest(index_dir)
        if pre is not None:
            deleted_arr = load_deleted_ids(index_dir, pre)
        if deleted_arr is None or deleted_arr.size == 0:
            deleted_arr = None
            purge_deleted = False

    shard_postings = max(BLOCK_SIZE,
                         -(-shard_postings // BLOCK_SIZE) * BLOCK_SIZE)
    m = read_manifest(index_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest under {index_dir}")
    by_id = {s["seg"]: s for s in m.segments}
    groups = [list(g) for g in groups if g]
    flat = [s for g in groups for s in g]
    if len(set(flat)) != len(flat):
        raise ValueError("merge groups must be disjoint")
    missing = set(flat) - set(by_id)
    if missing:
        raise ValueError(f"segments not in manifest: {sorted(missing)}")

    # target ids: disjoint MERGE_SEG_BASE namespace, one per group
    base = max(MERGE_SEG_BASE - 1, max(by_id)) + 1
    targets = list(range(base, base + len(groups)))
    seg_to_target = {s: t for g, t in zip(groups, targets) for s in g}
    srcs_by_target = {
        t: sorted((by_id[s] for s in g), key=lambda s: s["doc_base"])
        for g, t in zip(groups, targets)
    }
    # global source order by doc_base: correct within every group
    all_srcs = sorted((by_id[s] for s in flat), key=lambda s: s["doc_base"])
    seg_order = {s["seg"]: i for i, s in enumerate(all_srcs)}

    tmap = F.create_map(
        *[F.lit(x) for pair in seg_to_target.items() for x in pair])
    postings = (
        spark.read.parquet(f"{index_dir}/postings")
        .filter(F.col("seg").isin(flat))
        .withColumn("__target", tmap[F.col("seg")])
    )
    # Correctness invariant (ADVICE r1, medium): across ALL output rows
    # of a (target, term), doc ranges must be disjoint so the
    # query-side shard-ordered concat stays sorted — a kernel group
    # must see EVERY row of a term within its target. Hot terms (any
    # shard > 0 row in the group) pass through as a pure-JVM
    # projection; cold terms concat + re-shard in the kernel. When
    # purging, hot rows also go through the kernel (their postings may
    # contain tombstoned docs).
    kernel = _merge_kernel_factory(None, seg_order, shard_postings,
                                   deleted=deleted_arr)
    has_hot = (not purge_deleted
               and bool(postings.filter(F.col("shard") > 0).head(1)))
    if not has_hot:
        merged = postings.groupBy("__target", "term_bucket").applyInPandas(
            kernel, schema=MERGED_POSTINGS_SCHEMA)
    else:
        hot_terms = (
            postings.filter(F.col("shard") > 0)
            .select("__target", "term_bucket", "term").distinct()
        )
        cold = postings.join(F.broadcast(hot_terms),
                             ["__target", "term_bucket", "term"], "left_anti")
        merged_cold = cold.groupBy("__target", "term_bucket").applyInPandas(
            kernel, schema=MERGED_POSTINGS_SCHEMA)
        passthrough = (
            postings.join(F.broadcast(hot_terms),
                          ["__target", "term_bucket", "term"], "left_semi")
            .withColumn("seg", F.col("__target").cast("int"))
            .withColumn("first_doc_key", F.element_at("blk_first", 1))
            .select(*merged_cold.columns)
        )
        merged = merged_cold.unionByName(passthrough)
    # shard renumbering per (segment, term) in doc order (metadata-sized)
    w = Window.partitionBy("seg", "term").orderBy("first_doc_key")
    merged = (
        merged.withColumn("shard", F.row_number().over(w) - F.lit(1))
        .drop("first_doc_key")
    )
    # dynamic overwrite scoped to THIS write (only the source/target seg
    # partitions are replaced; a session-global conf would leak — it
    # also suppresses the root _SUCCESS marker for every later
    # partitioned write in the session, e.g. ivf_build's)
    merged.sortWithinPartitions("term").write.mode("overwrite") \
        .option("partitionOverwriteMode", "dynamic") \
        .partitionBy("seg").parquet(f"{index_dir}/postings")

    docmeta = (
        spark.read.parquet(f"{index_dir}/docmeta")
        .filter(F.col("seg").isin(flat))
    )
    if purge_deleted:
        dels_df = spark.createDataFrame(
            [(int(x),) for x in deleted_arr], "doc_id long")
        docmeta = docmeta.join(F.broadcast(dels_df), "doc_id", "left_anti")
    docmeta.withColumn("seg", tmap[F.col("seg")].cast("int")) \
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic") \
        .partitionBy("seg").parquet(f"{index_dir}/docmeta")

    stats_rows = {
        r["seg"]: r for r in spark.read.parquet(f"{index_dir}/postings")
        .filter(F.col("seg").isin(targets))
        .groupBy("seg")
        .agg(F.count_distinct("term").alias("n"), F.sum("df").alias("np"))
        .collect()
    }
    live_rows = {}
    if purge_deleted:
        live_rows = {
            r["seg"]: r for r in spark.read.parquet(f"{index_dir}/docmeta")
            .filter(F.col("seg").isin(targets))
            .groupBy("seg")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("dl"))
            .collect()
        }

    new_entries = []
    for t in targets:
        srcs = srcs_by_target[t]
        fp = 0
        for s in srcs:
            fp ^= int(s["input_fingerprint"], 16)
        pdir = os.path.join(index_dir, "postings", f"seg={t}")
        postings_bytes = sum(
            os.path.getsize(os.path.join(pdir, f))
            for f in os.listdir(pdir) if f.endswith(".parquet")
        ) if os.path.isdir(pdir) else 0
        st = stats_rows.get(t)
        entry = {
            "seg": int(t),
            "n_docs": sum(s["n_docs"] for s in srcs),
            "doc_base": srcs[0]["doc_base"],
            "doc_lo": min(s.get("doc_lo", s["doc_base"]) for s in srcs),
            "doc_hi": max(s.get("doc_hi", s["doc_base"] + s["n_docs"])
                          for s in srcs),
            "sum_dl": sum(s["sum_dl"] for s in srcs),
            "n_terms": int(st["n"]) if st else 0,
            "n_postings": (int(st["np"] or 0) if purge_deleted and st
                           else sum(s["n_postings"] for s in srcs)),
            "input_fingerprint": f"{fp:016x}",
            "postings_bytes": int(postings_bytes),
            "source": "merge(" + ",".join(str(s["seg"]) for s in srcs) + ")",
        }
        if purge_deleted:
            lv = live_rows.get(t)
            entry["purged"] = True
            entry["n_live"] = int(lv["n"]) if lv else 0
            entry["sum_dl_live"] = int(lv["dl"] or 0) if lv else 0
        elif any("n_live" in s for s in srcs):
            # merging a purged segment with unpurged ones: unpurged
            # sides stay delete-blind, matching per-segment Lucene
            entry["n_live"] = sum(s.get("n_live", s["n_docs"]) for s in srcs)
            entry["sum_dl_live"] = sum(
                s.get("sum_dl_live", s["sum_dl"]) for s in srcs)
        new_entries.append(entry)

    keep = [s for s in m.segments if s["seg"] not in set(flat)]
    out = Manifest(
        gen=m.gen + 1, docs_per_seg=m.docs_per_seg, analyzer=m.analyzer,
        field=m.field,
        segments=sorted(keep + new_entries, key=lambda s: s["seg"]),
        delete_files=list(m.delete_files),
    )
    commit_manifest(index_dir, out)
    return out


def force_merge(spark: SparkSession, index_dir: str,
                segs_per_tier: int = 10, max_merge_at_once: int = 10) -> Manifest:
    """Run the tiered policy to fixpoint (like forceMerge towards a
    budgeted segment count)."""
    m = read_manifest(index_dir)
    while True:
        # groups containing the -1 stub depend on an earlier merge of
        # the same planning round; execute only the independent groups
        # as ONE wave (merge_many single pass), then re-plan
        merges = [g for g in plan_merges(m, segs_per_tier, max_merge_at_once)
                  if -1 not in g]
        if not merges:
            return m
        m = merge_many(spark, index_dir, merges)


def expunge_deletes(spark: SparkSession, index_dir: str) -> Manifest:
    """forceMergeDeletes (`[U] .../index/IndexWriter.java ::
    forceMergeDeletes`): rewrite every segment whose doc range contains
    tombstones, physically dropping the deleted postings + docmeta rows.
    Tombstone files stay listed in the manifest — they still drive the
    MatchAll range mask — but collection statistics switch to the live
    counts, matching Lucene's post-merge stats."""
    m = read_manifest(index_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest under {index_dir}")
    from .delete import load_deleted_ids

    dels = load_deleted_ids(index_dir, m)
    if dels.size == 0:
        return m
    groups = []
    for s in m.segments:
        lo = s.get("doc_lo", s["doc_base"])
        hi = s.get("doc_hi", s["doc_base"] + s["n_docs"])
        i0, i1 = np.searchsorted(dels, [lo, hi])
        if i1 > i0 and not s.get("purged"):
            groups.append([s["seg"]])
    if not groups:
        return m
    # every affected segment rewrites in ONE distributed pass
    return merge_many(spark, index_dir, groups, purge_deleted=True)


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
