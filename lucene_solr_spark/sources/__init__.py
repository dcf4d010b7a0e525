"""Sources: the repo-file corpus seam + deterministic synthetic generator.

The authoritative input shape (BASELINE.json input_hint) is an Iceberg
table ``(repo, path, commit, lang, content)``. No Iceberg runtime jar
exists in this sandbox (SURVEY.md §2.1), so everything goes through
``load_source_table()`` which accepts any parquet/DataFrame of that
schema — swapping in ``spark.read.format("iceberg")`` is a one-line
change at this seam.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "load_documents", "load_source_table", "load_source_any", "load_jdbc",
    "synth_repo_files", "synth_rows",
    "synth_corpus_local", "assign_doc_ids", "SOURCE_SCHEMA",
    "apply_update_processors", "parse_xml_update",
]


def parse_xml_update(xml_text: str) -> list:
    """Solr XML update envelope -> the ordered command list
    ``operators.updatejson.apply_update_commands`` consumes
    (`[U] solr/core/.../handler/loader/XMLLoader.java`):

        <update>
          <add><doc><field name="f">v</field>...</doc>...</add>
          <delete><id>17</id><query>term</query></delete>
          <commit/>
        </update>

    A bare top-level ``<add>``/``<delete>``/``<commit>`` (Solr accepts
    both forms) parses the same. Repeated field names collect into a
    list (multiValued fields). Only the protocol shape lives here —
    everything distributed routes through the same lifecycle operators
    as the JSON loader, preserving command order."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_text)
    if root.tag in ("add", "delete", "commit"):
        nodes = [root]
    elif root.tag == "update":
        nodes = list(root)
    else:
        raise ValueError(f"unknown XML update element <{root.tag}>")
    cmds: list = []
    for node in nodes:
        if node.tag == "add":
            for docel in node.findall("doc"):
                doc: dict = {}
                for f in docel.findall("field"):
                    name = f.attrib["name"]
                    val = f.text or ""
                    if name in doc:
                        prev = doc[name]
                        doc[name] = (prev if isinstance(prev, list)
                                     else [prev]) + [val]
                    else:
                        doc[name] = val
                cmds.append({"add": {"doc": doc}})
        elif node.tag == "delete":
            for ch in node:
                if ch.tag == "id":
                    cmds.append({"delete": {"id": int(ch.text)}})
                elif ch.tag == "query":
                    cmds.append({"delete": {"query": ch.text or ""}})
                else:
                    raise ValueError(f"delete needs <id> or <query>, "
                                     f"got <{ch.tag}>")
        elif node.tag == "commit":
            cmds.append({"commit": {}})
        else:
            raise ValueError(f"unknown XML update element <{node.tag}>")
    return cmds

SOURCE_SCHEMA = "repo string, path string, commit string, lang string, content string"


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def load_source_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically map the driver's ``documents`` table onto the
    input_hint shape (repo, path, commit, lang, content) + stable doc_id.

    The documents table already carries a dense ``doc_id`` — it is kept
    as the engine's global docID (SURVEY.md §1.1 requires deterministic
    assignment; a pre-assigned key is the strongest form).
    """
    d = load_documents(spark, sf_dir)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(F.lit("corpus/"), F.col("source")).alias("repo"),
        F.concat(F.lit("docs/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.sha1(F.concat_ws(":", F.col("source"), F.col("doc_id").cast("string"))).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def load_source_any(spark: SparkSession, path: str, fmt: str = "parquet",
                    **options) -> DataFrame:
    """Format-agnostic ingest seam (SURVEY.md §2.1: Solr's JSON/CSV
    update handlers + DIH). ``fmt``: parquet | json | csv | orc — each
    maps to the native Spark reader (distributed splittable scan,
    schema projection + predicate pushdown where the format supports
    it). CSV defaults to header=true; JSON expects line-delimited.
    Columns are projected onto the SOURCE_SCHEMA shape when present."""
    reader = spark.read.options(**options)
    if fmt == "csv":
        reader = reader.option("header", options.get("header", "true"))
    df = reader.format(fmt).load(path)
    want = ["doc_id", "repo", "path", "commit", "lang", "content"]
    if all(c in df.columns for c in want):
        return df.select(*want)
    return df


def load_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              num_partitions: int = 32, lower_bound=None, upper_bound=None,
              **options) -> DataFrame:
    """DataImportHandler / JDBC source seam (SURVEY.md §2.1,
    `[U] solr/contrib/dataimporthandler/`): a thin wrapper over
    ``spark.read.jdbc``. Always pass ``partition_column`` + bounds for
    any non-toy table — without them Spark reads the whole table
    through ONE connection; with them the scan fans out into
    ``num_partitions`` range-partitioned queries."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("numPartitions", num_partitions)
                  .option("lowerBound", lower_bound)
                  .option("upperBound", upper_bound))
    return reader.load()


# ------------------------------------------------------- synthetic corpus

_EXTS = [("py", "python"), ("java", "java"), ("scala", "scala"), ("md", "markdown"), ("txt", "text")]

# Unicode spice rows pin StandardAnalyzer edge semantics (FIXTURES.md §1,
# SURVEY.md §4.4.7): accents, CJK, Turkish dotted I, emoji, >255-char token.
_SPICE = [
    "Motörhead café naïve façade – déjà vu",
    "日本語のテキスト と source code の mix",
    "İstanbul ların ISPARTA kişi",
    "emoji 🚀 rocket_launch 🎉 done",
    "longtoken_" + "x" * 300 + " end",
    "o'neil can’t v1.2.3 3.14 1,000 foo.bar",
]


def _vocab(size: int = 5000) -> np.ndarray:
    kws = ["def", "class", "return", "import", "public", "static", "void", "val",
           "var", "for", "while", "if", "else", "try", "catch", "lambda", "spark",
           "index", "merge", "query", "token", "score", "segment", "posting"]
    idents = [f"ident_{i:04d}" for i in range(size - len(kws))]
    return np.array(kws + idents, dtype=object)


def _zipf_weights(n: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** s
    return w / w.sum()


def synth_rows(ids, seed: int = 42) -> pd.DataFrame:
    """Deterministic row generation for a batch of ids (pure
    Python/numpy — shared by the Spark generator and the no-Spark
    golden-fixture path so both see byte-identical corpora)."""
    vocab = _vocab()
    weights = _zipf_weights(len(vocab))
    punct = np.array([" ", " ", " ", "\n", "(", ")", ";", " = ", " + ", "."], dtype=object)
    rows = []
    for i in ids:
        i = int(i)
        rng = np.random.default_rng(seed * 1_000_003 + i)
        n_tok = int(rng.integers(20, 401))
        toks = rng.choice(vocab, size=n_tok, p=weights)
        seps = rng.choice(punct, size=n_tok)
        content = "".join(t + s for t, s in zip(toks, seps))
        if i % 37 == 0:
            content += " " + _SPICE[i % len(_SPICE)]
        repo = f"org{i % 7}/repo{i % 97}"
        ext, lang = _EXTS[i % len(_EXTS)]
        path = f"src/d{i // 100}/f{i}.{ext}"
        commit = hashlib.sha1(f"{repo}:{path}".encode()).hexdigest()
        rows.append((repo, path, commit, lang, content))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def synth_corpus_local(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """No-Spark fixture corpus with the deterministic doc_id rank
    (FIXTURES.md §1: dense rank over (repo, path, commit))."""
    pdf = synth_rows(range(n_rows), seed)
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    pdf["doc_id"] = np.arange(len(pdf), dtype=np.int64)
    return pdf


def synth_repo_files(spark: SparkSession, n_rows: int, seed: int = 42,
                     num_partitions: int | None = None) -> DataFrame:
    """FIXTURES.md §1 generator: seeded-PRNG token stream over a
    Zipf(1.2) vocabulary, deterministic per row id (safe to regenerate
    in any partitioning — each row's content depends only on (seed, i)).

    Vectorized: numpy PRNG per Arrow batch, no per-row Python UDF.
    """
    P = num_partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, P)

    def gen(batches):
        for pdf in batches:
            yield synth_rows(pdf["id"].to_numpy(), seed)

    return base.mapInPandas(gen, schema=SOURCE_SCHEMA)


def assign_doc_ids(df: DataFrame, order_cols=("repo", "path", "commit"),
                   num_partitions: int | None = None) -> DataFrame:
    """Deterministic dense global doc_id = rank over ``order_cols``.

    Scalable two-pass zipWithIndex shape (SURVEY.md §1.1 — NOT
    ``monotonically_increasing_id``, which is partitioning-dependent):
    range-partition + sort by the key, count rows per partition, then
    offset each partition's local row number. Global order is the total
    sort order regardless of where range boundaries fall, so the ids
    are deterministic for a given input.
    """
    spark = df.sparkSession
    P = num_partitions or spark.sparkContext.defaultParallelism
    cols = list(order_cols)
    ranged = df.repartitionByRange(P, *cols).sortWithinPartitions(*cols)
    ranged = ranged.withColumn("_pid", F.spark_partition_id()).cache()
    counts = {r["_pid"]: r["count"] for r in ranged.groupBy("_pid").count().collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in ranged.schema.fields
                           if f.name != "_pid") + ", doc_id long"

    def number(batches):
        local = -1
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["_pid"].iloc[0])
                local = offsets[pid]
            n = len(pdf)
            ids = np.arange(local, local + n, dtype=np.int64)
            local += n
            out = pdf.drop(columns=["_pid"])
            out["doc_id"] = ids
            yield out

    result = ranged.mapInPandas(number, schema=out_schema)
    return result


def apply_update_processors(df: DataFrame, chain) -> DataFrame:
    """UpdateRequestProcessor chain (`[U] solr/core/src/java/org/apache/
    solr/update/processor/` — TrimFieldUpdateProcessorFactory,
    RegexReplaceProcessorFactory, DefaultValueUpdateProcessorFactory,
    CloneFieldUpdateProcessorFactory / schema copyField,
    RemoveBlankFieldUpdateProcessorFactory): each processor is a pure
    column expression applied in chain order, so the whole chain stays
    inside whole-stage codegen — no UDF, nothing leaves the JVM.

    ``chain`` is a list of single-key dicts, applied in order:

        {"trim": [fields...]}               strip surrounding whitespace
        {"lower": [fields...]}              lowercase
        {"regex_replace": {"field": f, "pattern": p, "replacement": r}}
        {"copy_field": {"source": s, "dest": d}}     schema copyField
        {"default_value": {"field": f, "value": v}}  fill NULLs
        {"remove_blank": [fields...]}       '' -> NULL (then default
                                            rules or absence semantics)
    """
    from pyspark.sql import functions as F

    out = df
    for proc in chain:
        (kind, arg), = proc.items()
        if kind == "trim":
            for f in arg:
                out = out.withColumn(f, F.trim(F.col(f)))
        elif kind == "lower":
            for f in arg:
                out = out.withColumn(f, F.lower(F.col(f)))
        elif kind == "regex_replace":
            out = out.withColumn(
                arg["field"],
                F.regexp_replace(F.col(arg["field"]), arg["pattern"],
                                 arg["replacement"]))
        elif kind == "copy_field":
            out = out.withColumn(arg["dest"], F.col(arg["source"]))
        elif kind == "default_value":
            out = out.withColumn(
                arg["field"],
                F.coalesce(F.col(arg["field"]), F.lit(arg["value"])))
        elif kind == "remove_blank":
            for f in arg:
                out = out.withColumn(
                    f, F.when(F.col(f) == "", None).otherwise(F.col(f)))
        else:
            raise ValueError(f"unknown update processor {kind!r}")
    return out
