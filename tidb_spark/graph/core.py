"""k-core decomposition: iterative degree peeling.

Beyond-reference graph analytics (the reference's MATCH surface stops at
path patterns; this is the same executed-extension posture as PageRank /
WCC in this repo).  The k-core of a graph is the maximal subgraph where
every vertex has degree >= k — the standard preprocessing step for
community mining and for bounding clique search.

Scale shape: each peel round is ONE map-side-combined degree aggregate
plus two broadcast-or-shuffled anti-joins keyed on the vertex — the
same keyed-join discipline as the BFS/components operators.  The number
of rounds is bounded by the peeling depth (typically a handful; the
degeneracy ordering at 100 TB is produced by exactly this loop).  The
per-round driver sync is a single count of REMOVED vertices (1-row
control plane), and edges are lazily checkpointed so every round's plan
has constant shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 100


def k_core(edges: DataFrame, k: int, *, a: str = "a", b: str = "b") -> DataFrame:
    """(v, core_degree) for every vertex of the k-core of the undirected,
    deduplicated edge set ``edges``; empty frame when no k-core exists."""
    e = edges.select(F.col(a).alias("a"), F.col(b).alias("b")).localCheckpoint(
        eager=False
    )
    for _ in range(MAX_ROUNDS):
        deg = (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        bad = deg.where(F.col("c") < k).select("v").localCheckpoint(eager=False)
        n_bad = bad.count()
        if n_bad == 0:
            break
        e = (
            e.join(bad.withColumnRenamed("v", "a"), "a", "left_anti")
            .join(bad.withColumnRenamed("v", "b"), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
    else:
        raise RuntimeError(f"k_core: no fixpoint after {MAX_ROUNDS} rounds")
    return (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )
