"""Duplicate-cluster resolution: connected components over near-dup pairs.

Pairwise dedup (n-gram Jaccard / MinHash-LSH / SimHash / embedding cosine —
``tidb_spark/data/dedup.py``) yields EDGES; a training-data pipeline needs
the transitive closure: one canonical document per duplicate CLUSTER (A~B,
B~C ⇒ {A,B,C} keep min id).  The reference engine expresses this with a
recursive CTE walk (its recursive-CTE executor; our oracle does exactly
that in DuckDB) — fine for small graphs, O(diameter) rounds.

At 100 TB the right algorithm is the alternating large-star / small-star
map-reduce of Kiveris et al., "Connected Components in MapReduce and
Beyond" (SoCC'14): each round is ONE groupBy (min-neighbor per node) plus
ONE join, and the edge set converges to min-rooted stars in O(log n)
rounds regardless of diameter — no per-vertex frontier like BFS, no
driver-side union-find.  Every round ends in ``localCheckpoint`` to cut
lineage (same harness discipline as ``graph/shortest.py``); convergence is
detected by an order-insensitive edge-set checksum, so termination costs
one tiny agg per round, not a full comparison join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Orient every edge (hi → lo), dropping self-loops and duplicates."""
    return (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """large-star(u): connect every strictly-larger neighbor of u to
    m = min({u} ∪ N(u))."""
    sym = e.select("u", "v").union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("minv"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(
            F.col("v").alias("u"),
            F.least(F.col("u"), F.col("minv")).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        # No distinct here: _small_star (always applied next) ends in one,
        # and each sym row yields at most one output edge, so duplicates
        # are bounded by the input edge count — dropping the intermediate
        # distinct removes a whole shuffle+dedup stage per round.
    )


def _small_star(e: DataFrame) -> DataFrame:
    """small-star(u): connect u and all its smaller neighbors to their
    collective minimum."""
    o = e.select(
        F.greatest(F.col("u"), F.col("v")).alias("u"),
        F.least(F.col("u"), F.col("v")).alias("v"),
    )
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        o.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    centers = mins.select(F.col("u"), F.col("m").alias("v"))
    return rewired.union(centers).where(F.col("u") != F.col("v")).distinct()


def _checksum(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # XOR-fold of per-edge hashes: order-insensitive and cannot
        # overflow (edges are distinct, so XOR can't self-cancel dups).
        F.coalesce(
            F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    *,
    max_rounds: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component
    id = the minimum node id in its connected component.  Undirected;
    self-loops ignored.

    Alternating large-star/small-star rounds; converges in O(log n)
    rounds (each: one shuffle-agg + one shuffle-join, both on the node
    key — AQE handles skewed super-nodes)."""
    # Lazy checkpoints + pipelined checksums: the checksum action is what
    # materializes each round's checkpoint (ONE fused job per round), and
    # it runs on a helper thread so round n's checksum JOB overlaps round
    # n+1's plan CONSTRUCTION — the same overlap discipline as
    # operators/rounds.py, adapted to a fixpoint stop (checksum stable)
    # instead of an empty-frontier stop.  The round built past the
    # fixpoint is plan-only; it never executes.
    from concurrent.futures import ThreadPoolExecutor

    e = _canon(edges, src, dst).localCheckpoint(eager=False)
    prev: tuple[int, int] | None = None
    with ThreadPoolExecutor(1) as pool:
        fut = pool.submit(_checksum, e)
        for _ in range(max_rounds):
            nxt = _small_star(_large_star(e)).localCheckpoint(eager=False)
            cur = fut.result()
            if cur == prev:
                break  # e already converged; nxt was never executed
            prev = cur
            fut = pool.submit(_checksum, nxt)
            e = nxt
        else:
            fut.result()
    # Converged edges are min-rooted stars: non-roots point at their root.
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    assign = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = nodes.join(assign.select("node"), "node", "left_anti").select(
        F.col("node"), F.col("node").alias("component")
    )
    return assign.union(roots)


def duplicate_clusters(
    pairs: DataFrame,
    src: str = "d1",
    dst: str = "d2",
) -> DataFrame:
    """Near-dup pairs → (doc_id, canonical_id, cluster_size): the
    transitive-closure grouping with canonical = min id per cluster.
    ``cluster_size`` counts documents in the cluster (≥ 2 by
    construction — only paired docs appear)."""
    cc = connected_components(pairs, src, dst)
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return cc.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        F.col("cluster_size"),
    )
