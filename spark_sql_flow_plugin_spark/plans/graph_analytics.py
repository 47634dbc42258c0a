"""Graph analytics over lineage edges as DataFrames.

A single query's lineage graph is metadata-sized, but a production catalog
accumulating listener-mode captures (SURVEY.md §1.2: "materialize nodes/
edges as two DataFrames") reaches millions of edges — at that size
reachability must be Spark SQL joins, not driver-side BFS (and not a graph
database round-trip). This module provides:

- ``transitive_closure``: iterative self-join to a fixpoint (bounded by the
  same depth cap 128 the reference uses for its closures), semi-naive style:
  each iteration only extends the frontier found in the previous one.
- ``reachable_from`` / ``reaching``: impact analysis ("everything downstream
  of table X" / "every source feeding query Y").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MAX_ITER = 128


def edges_df(spark, edges) -> DataFrame:
    """Node-level edge DataFrame from GraphEdge objects (dedup by pair)."""
    pairs = sorted({(e.from_id, e.to_id) for e in edges})
    return spark.createDataFrame(pairs, "src string, dst string")


def transitive_closure(edges: DataFrame, max_iter: int = _MAX_ITER) -> DataFrame:
    """All (src, dst) pairs connected by a directed path.

    Semi-naive iteration: join the frontier (paths discovered last round)
    against the base edges, subtract known pairs, repeat until empty. Each
    round is one shuffle on ``dst``; caching keeps the accumulated closure
    from recomputing its whole history every iteration.
    """
    # localCheckpoint (not persist) per round: it BOTH caches the round's
    # result AND truncates the logical plan — an iterative union/subtract
    # chain otherwise doubles its plan every round and driver-side
    # analysis/codegen time blows up within a few iterations. Checkpointed
    # state replaces the old round's storage automatically (no unpersist
    # bookkeeping, no storage-memory creep). Executor-local durability; use
    # df.checkpoint() to a reliable store on an unreliable cluster.
    base = edges.select("src", "dst").distinct().localCheckpoint()
    closure = base
    frontier = base
    for _ in range(max_iter):
        grown = (
            frontier.alias("f")
            .join(base.alias("e"), F.col("f.dst") == F.col("e.src"))
            .select(F.col("f.src").alias("src"), F.col("e.dst").alias("dst"))
            .distinct()
        )
        frontier = grown.subtract(closure).localCheckpoint()
        if frontier.isEmpty():
            break
        closure = closure.union(frontier).distinct().localCheckpoint()
    return closure


def reachable_from(edges: DataFrame, node_id: str) -> DataFrame:
    """Every node downstream of ``node_id`` (impact analysis)."""
    return (
        transitive_closure(edges)
        .where(F.col("src") == node_id)
        .select(F.col("dst").alias("node_id"))
    )


def reaching(edges: DataFrame, node_id: str) -> DataFrame:
    """Every node upstream of ``node_id`` (provenance analysis)."""
    return (
        transitive_closure(edges)
        .where(F.col("dst") == node_id)
        .select(F.col("src").alias("node_id"))
    )
