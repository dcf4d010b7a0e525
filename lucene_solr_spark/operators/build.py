"""Distributed inverted-index construction (the IndexWriter path).

Spark-first reimplementation of the reference build pipeline
(SURVEY.md §2.3):

- `[U] .../index/DocumentsWriterPerThread.java` — one Spark task per
  segment (``groupBy("seg").applyInPandas``) builds an in-memory
  inverted index for a contiguous doc_id range, exactly the DWPT role.
- `[U] .../index/DefaultIndexingChain.java :: flush` — the task writes
  the segment as parquet rows (postings/docmeta), gated by a manifest.
- `[U] .../codecs/lucene84/Lucene84PostingsWriter.java` + ``ForUtil
  BLOCK_SIZE=128`` — 128-doc blocks, delta+varint (ours, per
  north_star), with per-block (max_tf, min_norm) impacts mirroring
  `[U] .../codecs/lucene84/Lucene84SkipWriter.java` / ``Impacts.java``.
- `[U] .../index/SegmentInfos.java :: commit`` — atomic manifest
  ``gen-N.json`` rename publishes segments; readers only see segments
  listed in the manifest, so partial writes from a failed run are
  invisible and a re-run is idempotent (dynamic partition overwrite
  rewrites only the segments it recomputes). This is the
  checkpoint/resume protocol required by BASELINE.json north_rule.

Scale notes (100 TB / 10^12 files):
- doc space, not term space, partitions the build — no shuffle of raw
  content beyond the initial seg grouping; token rows shuffle once,
  keyed by ``seg`` (bounded: docs_per_seg * avg_dl rows per task).
- hot terms (huge df inside one segment) are sharded into multiple
  posting rows (``shard`` column) so no single parquet row explodes;
  query-side concatenation is doc-ordered and cheap.
- nothing driver-side is O(corpus): the driver only ever sees the
  per-segment metric rows that go into the manifest.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.smallfloat import encode_norms
from ..functions.varint import encode_varint_with_lengths

BLOCK_SIZE = 128  # docs per posting block, mirroring ForUtil.BLOCK_SIZE
DEFAULT_DOCS_PER_SEG = 4096
DEFAULT_SHARD_POSTINGS = 1 << 17  # hot-term row split threshold
TERM_BUCKETS = 1024  # coarse term-space partitioning for pushdown at scale

# Flat format v3 (functions/postings.py): whole-list blobs + per-block
# metadata arrays instead of nested block structs
POSTINGS_SCHEMA = (
    "field string, term string, term_bucket int, seg int, shard int, "
    "df int, cum_tf long, max_tf int, min_norm int, "
    "blk_first array<long>, blk_last array<long>, blk_n array<int>, "
    "blk_max_tf array<int>, blk_min_norm array<int>, "
    "blk_doc_off array<int>, blk_tf_off array<int>, blk_pos_off array<int>, "
    "docs binary, tfs binary, pos binary, norms binary"
)

DOCMETA_SCHEMA = (
    "seg int, doc_id long, repo string, path string, commit string, lang string, "
    "dl int, norm_byte int, sha256 string"
)


_POSTING_COLS = [c.split()[0] for c in POSTINGS_SCHEMA.split(", ") if c.split()[0] != "seg"]
_DOCMETA_COLS = ["doc_id", "repo", "path", "commit", "lang", "dl", "norm_byte", "sha256"]

# per-segment stats row: the ONLY thing a build task sends back to the
# driver (the manifest/lineage record; everything else is written by the
# task itself, Lucene-style)
STATS_SCHEMA = (
    "seg int, n_docs long, doc_base long, sum_dl long, "
    "n_terms long, n_postings long, fp_sum long, postings_bytes long"
)


def _postings_pa_schema():
    import pyarrow as pa

    return pa.schema([
        ("field", pa.string()), ("term", pa.string()),
        ("term_bucket", pa.int32()), ("shard", pa.int32()),
        ("df", pa.int32()), ("cum_tf", pa.int64()),
        ("max_tf", pa.int32()), ("min_norm", pa.int32()),
        ("blk_first", pa.list_(pa.int64())), ("blk_last", pa.list_(pa.int64())),
        ("blk_n", pa.list_(pa.int32())), ("blk_max_tf", pa.list_(pa.int32())),
        ("blk_min_norm", pa.list_(pa.int32())),
        ("blk_doc_off", pa.list_(pa.int32())), ("blk_tf_off", pa.list_(pa.int32())),
        ("blk_pos_off", pa.list_(pa.int32())),
        ("docs", pa.binary()), ("tfs", pa.binary()),
        ("pos", pa.binary()), ("norms", pa.binary()),
    ])


def _atomic_parquet_write(table, dirname: str, row_group_size: int) -> None:
    """tmp write + atomic rename, one file per segment dir. Retried or
    speculative tasks rewrite identical deterministic bytes, so the
    rename is idempotent (the segments_N discipline at file level)."""
    import pyarrow.parquet as pq

    os.makedirs(dirname, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=dirname, suffix=".inprogress")
    os.close(fd)
    try:
        pq.write_table(table, tmp, row_group_size=row_group_size,
                       compression="snappy")
        os.replace(tmp, os.path.join(dirname, "part-00000.parquet"))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _seg_term_codes(texts: List[str], analyzer: str):
    """Python texts of ONE segment -> (dls, codes in sorted-term space,
    uniq_sorted terms, positions-or-None). CPython's sre ``findall``
    measures ~5x faster per core than Java's regex on the same token
    grammar (lookaround alternations are slow on the JVM), so
    tokenization stays in the Python kernel; everything downstream of
    the token lists is numpy/pandas vectorized.

    Gap-free analyzers return positions=None (the kernel derives them
    as 0..dl-1); stop-filtered analyzers return the explicit
    position stream with holes (PositionIncrementAttribute gaps).

    Returns ``(dls, norm_lens, codes, uniq_sorted, positions)``:
    ``dls`` counts EMITTED tokens (the flat-stream offsets and the
    segment's sum_dl == sumTotalTermFreq); ``norm_lens`` is the
    discountOverlaps=true FieldInvertState length (posIncr-0 stacked
    tokens excluded — see analysis.field_length) that feeds the norm
    byte. Identical for non-stacking analyzers."""
    from ..analysis import analyzer_has_gaps, analyze, field_length, tokenize

    if analyzer_has_gaps(analyzer):
        pair_lists = [analyze(t, analyzer) for t in texts]
        dls = np.fromiter((len(p) for p in pair_lists), dtype=np.int64,
                          count=len(pair_lists))
        norm_lens = np.fromiter((field_length(p) for p in pair_lists),
                                dtype=np.int64, count=len(pair_lists))
        total = int(dls.sum())
        if total == 0:
            return dls, norm_lens, np.empty(0, np.int64), [], None
        flat = np.empty(total, dtype=object)
        pos = np.empty(total, dtype=np.int64)
        o = 0
        for pairs in pair_lists:
            for t, pp in pairs:
                flat[o] = t
                pos[o] = pp
                o += 1
        codes, uniq = pd.factorize(flat, sort=True)
        return dls, norm_lens, codes.astype(np.int64), list(uniq), pos

    lists = [tokenize(t, analyzer) for t in texts]
    dls = np.fromiter((len(lst) for lst in lists), dtype=np.int64, count=len(lists))
    total = int(dls.sum())
    if total == 0:
        return dls, dls, np.empty(0, np.int64), [], None
    flat = np.empty(total, dtype=object)
    o = 0
    for lst in lists:
        flat[o:o + len(lst)] = lst
        o += len(lst)
    codes, uniq = pd.factorize(flat, sort=True)
    return dls, dls, codes.astype(np.int64), list(uniq), None


def make_segment_writer(index_dir: str, analyzer: str = "standard",
                        field_name: str = "content",
                        shard_postings: int = DEFAULT_SHARD_POSTINGS):
    """mapInArrow kernel: a partition of tokenized docs -> segment
    parquet ON DISK + 1 stats row per segment.

    Per segment: tokenize (CPython sre, see ``_seg_term_codes``), one
    lexsort, run-length boundaries, ONE varint pass per stream
    (docs/tfs/pos), then a fully columnar Arrow table assembly where
    per-term rows are zero-copy byte SLICES of those three stream
    buffers (no per-term Python loop). Mirrors the
    reference's per-term postings write (`[U] .../index/
    FreqProxTermsWriter.java :: flush`) with the per-block impacts of
    `Lucene84SkipWriter.java`.

    The task writes its own parquet (pyarrow, tmp+rename) exactly like
    a Lucene DWPT flushing segment files, and returns only the
    manifest stats rows — no posting bytes ever re-enter the Spark
    shuffle/commit machinery, which is what makes the build scale
    linearly with cores.
    """
    import pyarrow as pa

    def process_segment(sub) -> dict:
        seg = sub["seg"][0].as_py()
        doc_ids = sub["doc_id"].to_numpy().astype(np.int64)
        dls, norm_lens, codes_flat, uniq_list, pos_flat = _seg_term_codes(
            sub[field_name].to_pylist(), analyzer
        )
        norms_by_doc = encode_norms(norm_lens).astype(np.int64)

        total = int(dls.sum())
        if total:
            doc_idx = np.repeat(np.arange(len(sub), dtype=np.int64), dls)
            if pos_flat is None:
                starts = np.zeros(len(sub), dtype=np.int64)
                starts[1:] = np.cumsum(dls)[:-1]
                pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(starts, dls)
            else:
                pos_in_doc = pos_flat  # explicit stream with stopword gaps
            codes = codes_flat

            order = np.lexsort((pos_in_doc, doc_idx, codes))
            c_s, d_s, p_s = codes[order], doc_idx[order], pos_in_doc[order]

            # (term, doc) run boundaries -> tf per posting
            pair_change = np.empty(total, dtype=bool)
            pair_change[0] = True
            pair_change[1:] = (np.diff(c_s) != 0) | (np.diff(d_s) != 0)
            run_starts = np.flatnonzero(pair_change)
            run_ends = np.append(run_starts[1:], total)
            tf_all = (run_ends - run_starts).astype(np.int64)
            post_term = c_s[run_starts]            # term code per posting
            post_doc = d_s[run_starts]             # local doc idx per posting
            n_post = len(post_term)

            # position deltas over the sorted stream, absolute at every
            # (term, doc) run start
            pos_delta = np.empty(total, dtype=np.int64)
            pos_delta[0] = p_s[0]
            pos_delta[1:] = p_s[1:] - p_s[:-1]
            pos_delta[run_starts] = p_s[run_starts]

            # term boundaries over the posting stream
            t_change = np.empty(n_post, dtype=bool)
            t_change[0] = True
            t_change[1:] = np.diff(post_term) != 0
            term_starts = np.flatnonzero(t_change)
            term_ends = np.append(term_starts[1:], n_post)

            # global 128-doc block grid, aligned to term starts (shard
            # boundaries are multiples of BLOCK_SIZE so they align too)
            nb = (term_ends - term_starts + BLOCK_SIZE - 1) // BLOCK_SIZE
            blk_of_term = np.repeat(np.arange(len(term_starts)), nb)
            blk_local = np.arange(int(nb.sum()), dtype=np.int64) - \
                np.repeat(np.cumsum(nb) - nb, nb)
            block_starts = term_starts[blk_of_term] + blk_local * BLOCK_SIZE
            block_ends = np.minimum(block_starts + BLOCK_SIZE, term_ends[blk_of_term])

            docs_stream = doc_ids[post_doc]
            norms_stream = norms_by_doc[post_doc]

            # doc deltas, absolute reset at every block start
            ddel = np.empty(n_post, dtype=np.int64)
            ddel[0] = docs_stream[0]
            np.subtract(docs_stream[1:], docs_stream[:-1], out=ddel[1:])
            ddel[block_starts] = docs_stream[block_starts]

            # ONE varint pass per stream for the whole segment
            docs_buf, dlen = encode_varint_with_lengths(ddel)
            tfs_buf, tlen = encode_varint_with_lengths(tf_all)
            pos_buf, plen = encode_varint_with_lengths(pos_delta)
            dboff = np.zeros(n_post + 1, dtype=np.int64)
            np.cumsum(dlen, out=dboff[1:])
            tboff = np.zeros(n_post + 1, dtype=np.int64)
            np.cumsum(tlen, out=tboff[1:])
            pboff = np.zeros(total + 1, dtype=np.int64)
            np.cumsum(plen, out=pboff[1:])
            pos_excl = np.zeros(n_post + 1, dtype=np.int64)
            pos_excl[1:] = np.cumsum(tf_all)

            # per-block stats (reduceat over the contiguous block grid)
            blk_first_g = docs_stream[block_starts]
            blk_last_g = docs_stream[block_ends - 1]
            blk_n_g = (block_ends - block_starts).astype(np.int32)
            blk_max_tf_g = np.maximum.reduceat(tf_all, block_starts).astype(np.int32)
            blk_min_norm_g = np.minimum.reduceat(norms_stream, block_starts).astype(np.int32)
            blk_boundaries = np.zeros(len(term_starts) + 1, dtype=np.int64)
            np.cumsum(nb, out=blk_boundaries[1:])

            # per-term cum_tf / max_tf / min_norm via reduceat
            cum_tf_t = np.add.reduceat(tf_all, term_starts)
            max_tf_t = np.maximum.reduceat(tf_all, term_starts)
            min_norm_t = np.minimum.reduceat(norms_stream, term_starts)

            # ---- fully columnar row assembly (no per-term Python loop):
            # build segments never shard (df <= docs_per_seg << shard
            # threshold; merge handles sharding), so one row per term and
            # every array below is a zero-copy view over the stream
            # buffers via Arrow offsets.
            n_terms = len(term_starts)
            t_end_off = np.append(term_starts, n_post)

            def _list_arr(values: np.ndarray, boundaries: np.ndarray, typ):
                return pa.ListArray.from_arrays(
                    pa.array(boundaries.astype(np.int32)), pa.array(values, typ))

            def _binary_arr(buf: bytes, value_offsets: np.ndarray):
                off = np.ascontiguousarray(value_offsets, dtype=np.int32)
                return pa.Array.from_buffers(
                    pa.binary(), len(off) - 1,
                    [None, pa.py_buffer(off.tobytes()), pa.py_buffer(buf)])

            d_lo_blk = dboff[term_starts][blk_of_term]
            t_lo_blk = tboff[term_starts][blk_of_term]
            p_lo_blk = pboff[pos_excl[term_starts]][blk_of_term]
            buckets = np.fromiter(
                (_term_bucket_py(t) for t in uniq_list), dtype=np.int32, count=n_terms)

            post_table = pa.table({
                "field": pa.repeat(field_name, n_terms).cast(pa.string()),
                "term": pa.array(uniq_list, pa.string()),
                "term_bucket": pa.array(buckets, pa.int32()),
                "shard": pa.repeat(pa.scalar(0, pa.int32()), n_terms),
                "df": pa.array((term_ends - term_starts).astype(np.int32), pa.int32()),
                "cum_tf": pa.array(cum_tf_t, pa.int64()),
                "max_tf": pa.array(max_tf_t.astype(np.int32), pa.int32()),
                "min_norm": pa.array(min_norm_t.astype(np.int32), pa.int32()),
                "blk_first": _list_arr(blk_first_g, blk_boundaries, pa.int64()),
                "blk_last": _list_arr(blk_last_g, blk_boundaries, pa.int64()),
                "blk_n": _list_arr(blk_n_g, blk_boundaries, pa.int32()),
                "blk_max_tf": _list_arr(blk_max_tf_g, blk_boundaries, pa.int32()),
                "blk_min_norm": _list_arr(blk_min_norm_g, blk_boundaries, pa.int32()),
                "blk_doc_off": _list_arr(
                    (dboff[block_starts] - d_lo_blk).astype(np.int32),
                    blk_boundaries, pa.int32()),
                "blk_tf_off": _list_arr(
                    (tboff[block_starts] - t_lo_blk).astype(np.int32),
                    blk_boundaries, pa.int32()),
                "blk_pos_off": _list_arr(
                    (pboff[pos_excl[block_starts]] - p_lo_blk).astype(np.int32),
                    blk_boundaries, pa.int32()),
                "docs": _binary_arr(docs_buf, dboff[t_end_off]),
                "tfs": _binary_arr(tfs_buf, tboff[t_end_off]),
                "pos": _binary_arr(pos_buf, pboff[pos_excl[t_end_off]]),
                "norms": _binary_arr(norms_stream.astype(np.uint8).tobytes(),
                                     t_end_off),
            }, schema=_postings_pa_schema())
            seg_n_terms = n_terms
            seg_n_postings = n_post
        else:
            post_table = _postings_pa_schema().empty_table()
            seg_n_terms = 0
            seg_n_postings = 0

        _atomic_parquet_write(post_table, os.path.join(index_dir, "postings", f"seg={seg}"),
                              row_group_size=2048)

        meta_table = pa.table({
            "doc_id": sub["doc_id"],
            "repo": sub["repo"],
            "path": sub["path"],
            "commit": sub["commit"],
            "lang": sub["lang"],
            "dl": pa.array(dls, pa.int32()),
            "norm_byte": pa.array(norms_by_doc, pa.int32()),
            "sha256": sub["sha256"],
        })
        _atomic_parquet_write(meta_table, os.path.join(index_dir, "docmeta", f"seg={seg}"),
                              row_group_size=65536)

        fp = 0
        for s in sub["sha256"].to_pylist():
            fp ^= int(s[:15], 16)
        pfile = os.path.join(index_dir, "postings", f"seg={seg}", "part-00000.parquet")
        return {
            "seg": int(seg),
            "n_docs": len(sub),
            "doc_base": int(doc_ids.min()),
            "sum_dl": int(dls.sum()),
            "n_terms": int(seg_n_terms),
            "n_postings": int(seg_n_postings),
            "fp_sum": fp,
            "postings_bytes": os.path.getsize(pfile),
        }

    stats_pa = pa.schema([
        ("seg", pa.int32()), ("n_docs", pa.int64()), ("doc_base", pa.int64()),
        ("sum_dl", pa.int64()), ("n_terms", pa.int64()),
        ("n_postings", pa.int64()), ("fp_sum", pa.int64()),
        ("postings_bytes", pa.int64()),
    ])

    def kernel(batches):
        batch_list = [b for b in batches if b.num_rows]
        rows = []
        if batch_list:
            tbl = pa.Table.from_batches(batch_list)
            seg_np = tbl["seg"].to_numpy()
            doc_np = tbl["doc_id"].to_numpy()
            order = np.lexsort((doc_np, seg_np))
            tbl = tbl.take(pa.array(order))
            seg_sorted = seg_np[order]
            bounds = np.flatnonzero(np.r_[True, np.diff(seg_sorted) != 0])
            bounds = np.append(bounds, len(seg_sorted))
            for i in range(len(bounds) - 1):
                sub = tbl.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
                rows.append(process_segment(sub))
        if rows:
            yield pa.RecordBatch.from_pylist(rows, schema=stats_pa)

    return kernel


def _term_bucket_py(term: str) -> int:
    # stable, python-side term bucket (matches query-side pushdown);
    # sha-independent cheap hash — NOT Spark's xxhash64 (unavailable in
    # pandas); defined once here and used by both build and query.
    import zlib

    return zlib.crc32(term.encode("utf-8")) % TERM_BUCKETS


# --------------------------------------------------------------- manifest


@dataclass
class Manifest:
    gen: int
    docs_per_seg: int
    analyzer: str
    field: str
    segments: List[dict] = field(default_factory=list)
    #: manifest-gated tombstone files under <index>/deletes/ (the .liv
    #: role — see operators/delete.py); carried forward by build/merge
    delete_files: List[str] = field(default_factory=list)

    @property
    def seg_ids(self) -> List[int]:
        return sorted(s["seg"] for s in self.segments)

    @property
    def doc_count(self) -> int:
        # purged segments (expungeDeletes) carry live-only counts; the
        # raw n_docs keeps the original doc RANGE for MatchAll math
        return sum(s.get("n_live", s["n_docs"]) for s in self.segments)

    @property
    def sum_dl(self) -> int:
        return sum(s.get("sum_dl_live", s["sum_dl"]) for s in self.segments)

    def doc_base(self) -> Dict[int, tuple]:
        return {s["seg"]: (s["doc_base"], s["n_docs"]) for s in self.segments}

    def to_json(self) -> str:
        return json.dumps({
            "gen": self.gen, "docs_per_seg": self.docs_per_seg,
            "analyzer": self.analyzer, "field": self.field,
            "segments": self.segments, "delete_files": self.delete_files,
        }, indent=1, sort_keys=True)


def manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest")


def read_manifest(index_dir: str) -> Optional[Manifest]:
    mdir = manifest_dir(index_dir)
    if not os.path.isdir(mdir):
        return None
    gens = sorted(
        int(f[4:-5]) for f in os.listdir(mdir) if f.startswith("gen-") and f.endswith(".json")
    )
    if not gens:
        return None
    with open(os.path.join(mdir, f"gen-{gens[-1]:06d}.json")) as fh:
        d = json.load(fh)
    return Manifest(gen=d["gen"], docs_per_seg=d["docs_per_seg"], analyzer=d["analyzer"],
                    field=d["field"], segments=d["segments"],
                    delete_files=d.get("delete_files", []))


def commit_manifest(index_dir: str, m: Manifest) -> None:
    """Atomic publish: tmp write + fsync + rename, the segments_N
    protocol (`[U] .../index/SegmentInfos.java :: commit`)."""
    mdir = manifest_dir(index_dir)
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"gen-{m.gen:06d}.json")
    fd, tmp = tempfile.mkstemp(dir=mdir, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(m.to_json())
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, final)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


# ------------------------------------------------------------- the writer


def build_index(
    spark: SparkSession,
    source: DataFrame,
    index_dir: str,
    docs_per_seg: int = DEFAULT_DOCS_PER_SEG,
    analyzer: str = "standard",
    field_name: str = "content",
    resume: bool = True,
    shard_postings: int = DEFAULT_SHARD_POSTINGS,
) -> Manifest:
    """Build (or resume) the inverted index for ``source`` at ``index_dir``.

    ``source`` must carry a deterministic global ``doc_id`` (see
    sources.assign_doc_ids / load_source_table). Segment = contiguous
    doc_id range of ``docs_per_seg`` docs (ingestion-order slices, like
    Lucene's flush-ordered segments).
    """
    if docs_per_seg > shard_postings:
        # the build kernel emits one row per term (df <= docs_per_seg
        # bounds it); sharding only ever arises in MERGED segments,
        # where merge_segments honors shard_postings
        raise ValueError(
            f"docs_per_seg ({docs_per_seg}) must be <= shard_postings "
            f"({shard_postings}); a build segment's df can never exceed "
            "its doc count, so larger segments would need in-build sharding"
        )
    prev = read_manifest(index_dir) if resume else None
    if prev is not None and (prev.docs_per_seg != docs_per_seg
                             or prev.analyzer != analyzer
                             or prev.field != field_name):
        raise ValueError(
            "resume with different docs_per_seg/analyzer/field — use a fresh index_dir")
    done = set(prev.seg_ids) if prev else set()

    src = source.withColumn("seg", (F.col("doc_id") / docs_per_seg).cast("int"))
    # resume must skip every COVERED DOC RANGE, not segment ids: merges
    # renumber segments (into the MERGE_SEG_BASE namespace), so a doc
    # range committed under a merged segment would otherwise be rebuilt
    # under its original build-time id -> duplicated docs.
    # The covered range is the CONSTRUCTION range [seg*dps, (seg+1)*dps)
    # recorded as (doc_lo, doc_hi): with sparse caller-assigned doc_ids
    # the actual-extent interval [doc_base, doc_base+n_docs) undercovers
    # a committed segment, and its leftover ids would be re-processed
    # under the same seg id — the task's atomic rename then replaces the
    # segment's parquet with only the leftovers while the manifest keeps
    # the stale entry: silent data loss (ADVICE r1). Legacy entries
    # without doc_lo/doc_hi fall back to the dense-extent interval.
    if prev and prev.segments:
        intervals = sorted(
            (s.get("doc_lo", s["doc_base"]),
             s.get("doc_hi", s["doc_base"] + s["n_docs"]))
            for s in prev.segments
        )
        covered = [list(intervals[0])]
        for lo, hi in intervals[1:]:
            if lo <= covered[-1][1]:
                covered[-1][1] = max(covered[-1][1], hi)
            else:
                covered.append([lo, hi])
        cond = F.lit(False)
        for lo, hi in covered:
            cond = cond | ((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        todo = src.filter(~cond)
    else:
        todo = src

    # sha256 JVM-side (codegen); ONE job: raw docs shuffle once keyed by
    # seg (the DWPT routing). Each task writes its segments' parquet
    # itself (Lucene DWPT flush) and only the per-segment stats rows
    # (manifest lineage + metrics, north_rule) travel back — the driver
    # is O(segments), never O(corpus).
    content = F.coalesce(F.col(field_name), F.lit(""))
    prepared = todo.select(
        "seg", "doc_id", "repo", "path", "commit", "lang",
        F.sha2(content, 256).alias("sha256"),
        content.alias(field_name),
    )
    stats = prepared.repartition("seg").mapInArrow(
        make_segment_writer(index_dir, analyzer, field_name, shard_postings),
        schema=STATS_SCHEMA,
    )
    seg_rows = {r["seg"]: r.asDict() for r in stats.collect()}
    new_segs = sorted(set(seg_rows) - done)

    segments = list(prev.segments) if prev else []
    for seg in new_segs:
        r = seg_rows.get(seg)
        if r is None:
            continue  # segment had no docs (empty range)
        segments.append({
            "seg": int(seg),
            "n_docs": int(r["n_docs"]),
            "doc_base": int(r["doc_base"]),
            "doc_lo": int(seg) * docs_per_seg,
            "doc_hi": (int(seg) + 1) * docs_per_seg,
            "sum_dl": int(r["sum_dl"]),
            "n_terms": int(r["n_terms"] or 0),
            "n_postings": int(r["n_postings"] or 0),
            "input_fingerprint": f"{int(r['fp_sum'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}",
            "postings_bytes": int(r.get("postings_bytes") or 0),
            "source": "build",
        })

    m = Manifest(
        gen=(prev.gen + 1 if prev else 1),
        docs_per_seg=docs_per_seg,
        analyzer=analyzer,
        field=field_name,
        segments=sorted(segments, key=lambda s: s["seg"]),
        delete_files=list(prev.delete_files) if prev else [],
    )
    commit_manifest(index_dir, m)
    return m
