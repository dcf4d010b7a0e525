"""Solr ``/update`` JSON command envelope (SURVEY §3.3).

The reference's update path speaks a JSON command stream
(`[U] solr/core/src/java/org/apache/solr/handler/loader/JsonLoader.java`
+ ``UpdateRequestHandler``):

    [{"add": {"doc": {...}}},
     {"delete": {"id": 17}} | {"delete": {"query": "term"}},
     {"commit": {}}]

This module maps that envelope onto the engine's lifecycle operators:
``add`` docs accumulate in a pending batch; ``delete.id`` tombstones;
``delete.query`` routes through deleteDocuments(Term); ``commit``
flushes the pending adds as an updateDocument batch (keyed replace —
Solr's uniqueKey overwrite semantics) and returns the new manifest
generation. Everything distributed-side reuses build/delete/update —
this file is only the protocol shape, so it stays a thin dispatcher.
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
    work is not visible and is dropped when the client goes away)."""
    from .delete import delete_by_term, delete_documents, update_documents

    pending: List[Dict] = []
    manifest: Optional[Manifest] = None
    for cmd in commands:
        if not isinstance(cmd, dict) or len(cmd) != 1:
            raise ValueError(f"malformed update command {cmd!r}")
        (op, arg), = cmd.items()
        if op == "add":
            doc = arg["doc"] if "doc" in arg else arg
            pending.append(doc)
        elif op == "delete":
            if "id" in arg:
                ids = arg["id"] if isinstance(arg["id"], list) else [arg["id"]]
                manifest = delete_documents(spark, index_dir,
                                            [int(i) for i in ids])
            elif "query" in arg:
                manifest = delete_by_term(spark, index_dir,
                                          str(arg["query"]))
            else:
                raise ValueError(f"delete needs id or query: {arg!r}")
        elif op == "commit":
            if pending:
                cols = sorted({k for d in pending for k in d})
                rows = [tuple(d.get(c) for c in cols) for d in pending]
                df = spark.createDataFrame(rows, ", ".join(
                    f"{c} string" for c in cols))
                manifest = update_documents(spark, index_dir, df,
                                            key_cols=key_cols)
                pending = []
            else:
                manifest = read_manifest(index_dir)
        else:
            raise ValueError(f"unknown update command {op!r}")
    return manifest
