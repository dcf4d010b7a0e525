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

from ..analysis import tokenize_series
from ..functions.smallfloat import encode_norms
from ..functions.varint import delta_encode, encode_varint

BLOCK_SIZE = 128  # docs per posting block, mirroring ForUtil.BLOCK_SIZE
DEFAULT_DOCS_PER_SEG = 4096
DEFAULT_SHARD_POSTINGS = 1 << 17  # hot-term row split threshold
TERM_BUCKETS = 1024  # coarse term-space partitioning for pushdown at scale

TOKENROW_SCHEMA = (
    "seg int, doc_id long, term string, tf int, norm int, positions array<int>, dl int"
)

POSTINGS_SCHEMA = (
    "field string, term string, term_bucket int, seg int, shard int, "
    "df int, cum_tf long, max_tf int, min_norm int, "
    "blocks array<struct<first_doc:long,last_doc:long,n:int,max_tf:int,min_norm:int,"
    "docs:binary,tfs:binary,pos:binary,norms:binary>>"
)

DOCMETA_SCHEMA = (
    "seg int, doc_id long, repo string, path string, commit string, lang string, "
    "dl int, norm_byte int, sha256 string"
)


# ------------------------------------------------------------ tokenization


def tokenize_to_termrows(src: DataFrame, analyzer: str = "standard",
                         field_name: str = "content") -> DataFrame:
    """source rows -> one row per (doc, term): (seg, doc_id, term, tf, norm,
    positions, dl). Vectorized pandas kernel behind mapInPandas."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            toks = tokenize_series(pdf[field_name], analyzer)
            dls = toks.map(len).to_numpy(dtype=np.int64)
            norms = encode_norms(dls).astype(np.int32)
            out_rows = {
                "seg": [], "doc_id": [], "term": [], "tf": [],
                "norm": [], "positions": [], "dl": [],
            }
            segs = pdf["seg"].to_numpy()
            dids = pdf["doc_id"].to_numpy()
            for i, tok_list in enumerate(toks):
                if not tok_list:
                    continue
                s = pd.Series(range(len(tok_list)), index=tok_list)
                grouped = s.groupby(level=0, sort=False).agg(list)
                n = len(grouped)
                out_rows["seg"].extend([int(segs[i])] * n)
                out_rows["doc_id"].extend([int(dids[i])] * n)
                out_rows["term"].extend(grouped.index.tolist())
                out_rows["positions"].extend(grouped.tolist())
                out_rows["tf"].extend(len(p) for p in grouped)
                out_rows["norm"].extend([int(norms[i])] * n)
                out_rows["dl"].extend([int(dls[i])] * n)
            yield pd.DataFrame(out_rows)

    return src.mapInPandas(kernel, schema=TOKENROW_SCHEMA)


# -------------------------------------------------------- segment building


def _encode_positions(pos_lists: List[List[int]]) -> bytes:
    """Per-doc delta-encode positions, concatenate, varint once."""
    if not pos_lists:
        return b""
    deltas = np.concatenate([delta_encode(np.asarray(p, dtype=np.int64)) for p in pos_lists])
    return encode_varint(deltas)


def _build_blocks(docs: np.ndarray, tfs: np.ndarray, norms: np.ndarray,
                  pos_lists: List[List[int]]) -> List[dict]:
    blocks = []
    for s in range(0, len(docs), BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, len(docs))
        d, t, nr = docs[s:e], tfs[s:e], norms[s:e]
        blocks.append({
            "first_doc": int(d[0]),
            "last_doc": int(d[-1]),
            "n": int(e - s),
            "max_tf": int(t.max()),
            "min_norm": int(nr.min()),
            "docs": encode_varint(delta_encode(d)),
            "tfs": encode_varint(t),
            "pos": _encode_positions(pos_lists[s:e]),
            "norms": nr.astype(np.uint8).tobytes(),
        })
    return blocks


def make_segment_kernel(field_name: str = "content",
                        shard_postings: int = DEFAULT_SHARD_POSTINGS):
    """applyInPandas kernel: all term rows of ONE segment -> posting rows."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["seg"].iloc[0])
        pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
        out = {c: [] for c in ("field", "term", "term_bucket", "seg", "shard",
                               "df", "cum_tf", "max_tf", "min_norm", "blocks")}
        for term, g in pdf.groupby("term", sort=True):
            docs = g["doc_id"].to_numpy(dtype=np.int64)
            tfs = g["tf"].to_numpy(dtype=np.int64)
            norms = g["norm"].to_numpy(dtype=np.int64)
            pos = g["positions"].tolist()
            n = len(docs)
            bucket = _term_bucket_py(term)
            for shard_idx, s in enumerate(range(0, n, shard_postings)):
                e = min(s + shard_postings, n)
                blocks = _build_blocks(docs[s:e], tfs[s:e], norms[s:e], pos[s:e])
                out["field"].append(field_name)
                out["term"].append(term)
                out["term_bucket"].append(bucket)
                out["seg"].append(seg)
                out["shard"].append(shard_idx)
                out["df"].append(int(e - s))
                out["cum_tf"].append(int(tfs[s:e].sum()))
                out["max_tf"].append(int(tfs[s:e].max()))
                out["min_norm"].append(int(norms[s:e].min()))
                out["blocks"].append(blocks)
        return pd.DataFrame(out)

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

    @property
    def seg_ids(self) -> List[int]:
        return sorted(s["seg"] for s in self.segments)

    @property
    def doc_count(self) -> int:
        return sum(s["n_docs"] for s in self.segments)

    @property
    def sum_dl(self) -> int:
        return sum(s["sum_dl"] for s in self.segments)

    def doc_base(self) -> Dict[int, tuple]:
        return {s["seg"]: (s["doc_base"], s["n_docs"]) for s in self.segments}

    def to_json(self) -> str:
        return json.dumps({
            "gen": self.gen, "docs_per_seg": self.docs_per_seg,
            "analyzer": self.analyzer, "field": self.field,
            "segments": self.segments,
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
                    field=d["field"], segments=d["segments"])


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
    prev = read_manifest(index_dir) if resume else None
    if prev is not None and (prev.docs_per_seg != docs_per_seg or prev.analyzer != analyzer):
        raise ValueError("resume with different docs_per_seg/analyzer — use a fresh index_dir")
    done = set(prev.seg_ids) if prev else set()

    src = source.withColumn("seg", (F.col("doc_id") / docs_per_seg).cast("int"))
    todo = src.filter(~F.col("seg").isin(*done)) if done else src

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    tok = tokenize_to_termrows(todo, analyzer, field_name).persist()
    postings = tok.groupBy("seg").applyInPandas(
        make_segment_kernel(field_name, shard_postings), schema=POSTINGS_SCHEMA
    )
    # sorted-by-term within each segment file -> parquet row-group stats
    # give term-predicate pushdown at query time (SURVEY.md §4.1)
    postings.sortWithinPartitions("term").write.mode("overwrite").partitionBy("seg").parquet(
        os.path.join(index_dir, "postings")
    )

    # left join so zero-token docs keep a docmeta row (dl=0, norm 0) —
    # docCount counts docs that have the field, like the oracle
    tokagg = tok.groupBy("doc_id").agg(
        F.first("dl").alias("dl"), F.first("norm").alias("norm_byte")
    )
    docmeta = (
        todo.select(
            "seg", "doc_id", "repo", "path", "commit", "lang",
            F.sha2(F.col(field_name), 256).alias("sha256"),
        )
        .join(tokagg, "doc_id", "left")
        .select(
            "seg", "doc_id", "repo", "path", "commit", "lang",
            F.coalesce("dl", F.lit(0)).alias("dl"),
            F.coalesce("norm_byte", F.lit(0)).alias("norm_byte"),
            "sha256",
        )
    )
    docmeta.write.mode("overwrite").partitionBy("seg").parquet(os.path.join(index_dir, "docmeta"))

    # per-segment metrics + lineage fingerprint (north_rule: per-partition
    # lineage + doc/term-count metrics in the checkpoint)
    dm = spark.read.parquet(os.path.join(index_dir, "docmeta"))
    new_segs = sorted(set(r["seg"] for r in todo.select("seg").distinct().collect()) - done)
    pstats = (
        spark.read.parquet(os.path.join(index_dir, "postings"))
        .filter(F.col("seg").isin(*new_segs) if new_segs else F.lit(False))
        .groupBy("seg")
        .agg(
            F.count_distinct("term").alias("n_terms"),
            F.sum("df").alias("n_postings"),
        )
    )
    dstats = (
        dm.filter(F.col("seg").isin(*new_segs) if new_segs else F.lit(False))
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("doc_base"),
            F.sum("dl").alias("sum_dl"),
            F.expr(
                "bit_xor(cast(conv(substring(sha256, 1, 15), 16, 10) as bigint))"
            ).alias("fp_sum"),
        )
    )
    seg_rows = {r["seg"]: r.asDict() for r in dstats.join(pstats, "seg", "left").collect()}
    tok.unpersist()

    segments = list(prev.segments) if prev else []
    for seg in new_segs:
        r = seg_rows.get(seg)
        if r is None:
            continue  # segment had no docs (empty range)
        segments.append({
            "seg": int(seg),
            "n_docs": int(r["n_docs"]),
            "doc_base": int(r["doc_base"]),
            "sum_dl": int(r["sum_dl"]),
            "n_terms": int(r["n_terms"] or 0),
            "n_postings": int(r["n_postings"] or 0),
            "input_fingerprint": f"{int(r['fp_sum'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}",
            "source": "build",
        })

    m = Manifest(
        gen=(prev.gen + 1 if prev else 1),
        docs_per_seg=docs_per_seg,
        analyzer=analyzer,
        field=field_name,
        segments=sorted(segments, key=lambda s: s["seg"]),
    )
    commit_manifest(index_dir, m)
    return m
