"""Solr ``/update`` JSON command envelope (SURVEY §3.3).

The reference's update path speaks a JSON command stream
(`[U] solr/core/src/java/org/apache/solr/handler/loader/JsonLoader.java`
+ ``UpdateRequestHandler``):

    [{"add": {"doc": {...}}},
     {"delete": {"id": 17}} | {"delete": {"query": "term"}},
     {"commit": {}}]

This module maps that envelope onto the engine's lifecycle operators:
``add`` and ``delete`` commands accumulate in ONE ordered pending log
(JsonLoader applies commands strictly in arrival order, so
``[{add X}, {delete X.id}]`` must leave X deleted — adds must not be
batched past a later delete); ``commit`` replays the log in order —
consecutive adds coalesce into an updateDocument batch (keyed replace,
Solr's uniqueKey overwrite semantics), ``delete.id`` tombstones,
``delete.query`` routes through deleteDocuments(Term) — and returns
the new manifest generation. Without a commit NOTHING becomes durable
(adds and deletes alike are dropped when the client goes away).
Everything distributed-side reuses build/delete/update — this file is
only the protocol shape, so it stays a thin dispatcher.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import SparkSession

from .build import Manifest, read_manifest

__all__ = ["apply_update_commands"]


def apply_update_commands(spark: SparkSession, index_dir: str,
                          commands: List[Dict],
                          key_cols: Sequence[str] = ("repo", "path"),
                          ) -> Optional[Manifest]:
    """Apply a JSON update command list; returns the manifest after the
    last commit (None if no commit was issued — like Solr, uncommitted
    work, adds AND deletes, is not visible and is dropped when the
    client goes away). Commands replay in arrival order at commit, so
    an add followed by a delete of the same doc leaves it deleted."""
    from .delete import delete_by_term, delete_documents, update_documents

    pending: List[tuple] = []  # ordered ("add", doc) | ("del", arg) log
    manifest: Optional[Manifest] = None

    def _flush_adds(batch: List[Dict]) -> Optional[Manifest]:
        cols = sorted({k for d in batch for k in d})
        rows = [tuple(d.get(c) for c in cols) for d in batch]
        df = spark.createDataFrame(rows, ", ".join(
            f"{c} string" for c in cols))
        return update_documents(spark, index_dir, df, key_cols=key_cols)

    for cmd in commands:
        if not isinstance(cmd, dict) or len(cmd) != 1:
            raise ValueError(f"malformed update command {cmd!r}")
        (op, arg), = cmd.items()
        if op == "add":
            pending.append(("add", arg["doc"] if "doc" in arg else arg))
        elif op == "delete":
            if "id" not in arg and "query" not in arg:
                raise ValueError(f"delete needs id or query: {arg!r}")
            pending.append(("del", arg))
        elif op == "commit":
            batch: List[Dict] = []
            for kind, a in pending:
                if kind == "add":
                    batch.append(a)
                    continue
                if batch:  # a delete fences any earlier adds
                    manifest = _flush_adds(batch)
                    batch = []
                if "id" in a:
                    ids = a["id"] if isinstance(a["id"], list) else [a["id"]]
                    manifest = delete_documents(spark, index_dir,
                                                [int(i) for i in ids])
                else:
                    manifest = delete_by_term(spark, index_dir,
                                              str(a["query"]))
            if batch:
                manifest = _flush_adds(batch)
            if not pending:
                manifest = read_manifest(index_dir)
            pending = []
        else:
            raise ValueError(f"unknown update command {op!r}")
    return manifest
