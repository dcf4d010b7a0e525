"""Graph streaming expressions (SURVEY.md §2.13).

Mirrors `[U] solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/
GatherNodesStream.java` and ``ShortestPathStream.java``: breadth-first
expansion expressed as ITERATIVE JOINS driven from the driver — each
hop is one distributed equi-join of the (small) frontier against the
edge table, exactly the reference's per-level gather, with the frontier
kept as a DataFrame (never collected).

Scale notes: the edge table is never shuffled more than once per hop
(the frontier side is broadcast when small); visited-set dedup is a
distinct() on node ids only. max_hops bounds the loop, so the driver
executes O(hops) jobs of bounded size — no unbounded lineage growth
(each level is localCheckpoint-free but the plans stay shallow because
the frontier is re-derived per level).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["gather_nodes", "shortest_path_length"]


def gather_nodes(edges: DataFrame, seeds: DataFrame, from_col: str,
                 to_col: str, hops: int = 1) -> DataFrame:
    """``nodes(...)`` / GatherNodesStream: BFS expansion from ``seeds``
    (a DataFrame with column ``from_col``) over directed edges,
    returning (node, level) — level = first hop at which the node was
    reached (seeds are level 0).
    """
    frontier = seeds.select(F.col(from_col).alias("node")).distinct() \
        .withColumn("level", F.lit(0))
    visited = frontier
    for h in range(1, hops + 1):
        nxt = (
            edges.join(
                F.broadcast(frontier.select(F.col("node").alias(from_col))),
                from_col,
            )
            .select(F.col(to_col).alias("node")).distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("level", F.lit(h))
        )
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def shortest_path_length(edges: DataFrame, src, dst, from_col: str,
                         to_col: str, max_hops: int = 6) -> Optional[int]:
    """ShortestPathStream (undirected-as-given): BFS level at which
    ``dst`` first appears starting from ``src``; None if unreachable
    within ``max_hops``. Each level is one join job; the check is a
    cheap filtered count on the (node-ids only) frontier."""
    frontier = edges.sparkSession.createDataFrame([(src,)], f"{from_col} string") \
        .select(F.col(from_col).cast(edges.schema[from_col].dataType).alias("node"))
    visited = frontier
    for h in range(1, max_hops + 1):
        nxt = (
            edges.join(F.broadcast(frontier.select(F.col("node").alias(from_col))),
                       from_col)
            .select(F.col(to_col).alias("node")).distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        if nxt.filter(F.col("node") == dst).head(1):
            return h
        frontier = nxt
        if not frontier.head(1):
            return None
        visited = visited.unionByName(frontier)
    return None
