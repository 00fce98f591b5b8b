"""Iterative graph dataflows expressed as DataFrame loops — the
engine's pattern for fixed-point algorithms (sibling of
``llm.dedup.connected_components``): each iteration is a join +
aggregate the optimizer plans independently, with periodic
``localCheckpoint`` to stop the lineage (and therefore the physical
plan) growing linearly with the iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, srcCol: str = "src", dstCol: str = "dst",
             iterations: int = 3, damping: float = 0.85,
             checkpointInterval: int = 10) -> DataFrame:
    """Fixed-iteration PageRank (the classic non-normalized
    contribution form: ``rank = (1-d) + d * sum(in_contribs)`` with
    each node starting at 1.0 — dangling nodes simply contribute
    nothing). Returns (node, rank).

    SIMPLE-GRAPH semantics: parallel (repeated) edges are
    deduplicated before ranking — an edge either exists or it does
    not, matching the catalog oracle's SELECT DISTINCT. If edge
    multiplicity should carry weight, pre-aggregate it into a weight
    column and divide contributions by the weighted out-degree
    instead (not implemented here; say so rather than silently
    ignoring repetition).

    Scale shape: per iteration ONE join of the edge list against the
    current ranks on src (both sides hash-partitioned on the same key,
    so AQE reuses the partitioning) and ONE aggregate on dst; rank
    state is O(nodes), never materialized on the driver. The edge list
    and degree frame are persisted once and reused every iteration.
    ``checkpointInterval`` bounds lineage: a 50-iteration loop without
    it compiles a 100-join mega-plan and re-executes everything on a
    late failure; with it, recovery and planning restart from the last
    materialized ranks. (localCheckpoint trades cluster-failure
    replayability for speed — same contract as
    operators/scale.py:zip_with_index, documented there.)
    """
    from mmlspark_spark.core.cache import (
        attach_intermediates,
        persist_intermediate,
    )

    e = persist_intermediate(
        edges.select(F.col(srcCol).alias("__src"),
                     F.col(dstCol).alias("__dst")).distinct())
    deg = persist_intermediate(
        e.groupBy("__src").agg(F.count("*").alias("__deg")))
    nodes = persist_intermediate(
        e.select(F.col("__src").alias("node"))
        .union(e.select(F.col("__dst").alias("node"))).distinct())
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for i in range(iterations):
        contribs = (e.join(deg, "__src")
                    .join(ranks, F.col("__src") == F.col("node"))
                    .select(F.col("__dst").alias("node"),
                            (F.col("rank") / F.col("__deg"))
                            .alias("__contrib")))
        incoming = contribs.groupBy("node").agg(
            F.sum("__contrib").alias("__in"))
        ranks = (nodes.join(incoming, "node", "left")
                 .select("node",
                         (F.lit(1.0 - damping)
                          + F.lit(damping)
                          * F.coalesce("__in", F.lit(0.0))).alias("rank")))
        if checkpointInterval and (i + 1) % checkpointInterval == 0 \
                and i + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return attach_intermediates(ranks, e, deg, nodes)
