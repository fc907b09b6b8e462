"""ANY SHORTEST path: distributed BFS over DataFrames.

Reference: ``GraphAnyShortestExec`` (``executor/graph_shortest.go:21``) runs
one sequential BFS per source row (``computeShortest`` ``:141-190``) with a
predecessor map, emitting src row + path string (``"[1,2,3]"`` or
``"Unreachable"``, ``deliverRes`` ``:90-111``) + dst row for every
(source, destination) pair.

Here all sources run in ONE distributed BFS: the frontier DataFrame carries
``(root, id, path)`` and each round is frontier ⋈ edges → dedup → anti-join
visited.  Determinism: the reference's "any" path depends on storage-key
iteration order; we canonicalize to the lexicographically-smallest shortest
path (per-round ``min(path)`` per (root, vertex) — the min of concatenations
is the concatenation of mins, so per-round propagation is globally correct).

Scale (100 TB): the per-round work is an equi-join shuffle-partitioned on the
frontier id; ``localCheckpoint`` truncates lineage each round; ``max_hops``
bounds the iteration (unbounded BFS on a 100 TB edge set is a driver-side
loop whose round count — not data volume — is the limiting factor).  Path
arrays make the frontier rows wide; for huge graphs swap the ``path`` column
for a predecessor table and reconstruct afterwards — same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tidb_spark.graph.model import EdgeTable
from tidb_spark.operators.rounds import (
    BROADCAST_MAX_ROWS as _BROADCAST_MAX_ROWS,
    run_rounds as _run_rounds,
)

UNREACHABLE = "Unreachable"

# Round latency policy (broadcast threshold, pipelined count/plan overlap,
# constant per-round plan shape) lives in tidb_spark/operators/rounds.py —
# shared with the recursive-CTE fixpoint runner.


def _union_all(rounds: list) -> DataFrame:
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out


def prepare_edges(edge: EdgeTable) -> DataFrame:
    """Checkpointed distinct 2-column edge projection (__src, __dst).

    The edge list is probed every BFS round — persisting the projection once
    freezes derived edge views (e.g. a self-join) instead of re-running the
    derivation per hop.  Distinct is semantics-preserving for every BFS
    variant here (min-path: min over duplicates is the min; all-paths/top-k:
    paths are vertex sequences, so duplicate edges are the only duplicate-path
    source) and lets one prepared frame be shared across variants.
    """
    return (
        edge.df.select(
            F.col(edge.src_col).cast("long").alias("__src"),
            F.col(edge.dst_col).cast("long").alias("__dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


def pair_results(
    reached: DataFrame, sources: DataFrame, destinations: DataFrame
) -> DataFrame:
    """Join BFS output onto the full source×destination grid, formatting the
    reference's path string (``deliverRes``, graph_shortest.go:93-106):
    ``"[1,2,3]"`` per path, one ``"Unreachable"`` / dist -1 row for pairs
    with no path.  The cross join is required by reference output semantics
    (a row per pair); at scale |destinations| must stay bounded."""
    pairs = sources.select(F.col("root").cast("long").alias("src_id")).crossJoin(
        destinations.select(F.col("dst_id").cast("long").alias("dst_id"))
    )
    # Semi-filter the reached set down to the requested destinations
    # BEFORE the pair join: BFS output covers every reached vertex, the
    # grid needs |sources|×|destinations| of them — the broadcast semi
    # prunes inside each checkpointed round scan.
    hits = reached.join(
        F.broadcast(
            destinations.select(F.col("dst_id").cast("long").alias("id"))
        ),
        on="id",
        how="left_semi",
    ).select(
        F.col("root").alias("src_id"),
        F.col("id").alias("dst_id"),
        "path",
        "dist",
    )
    return pairs.join(hits, on=["src_id", "dst_id"], how="left_outer").select(
        "src_id",
        "dst_id",
        F.when(F.col("path").isNull(), F.lit(UNREACHABLE))
        .otherwise(
            F.concat(F.lit("["), F.concat_ws(",", F.col("path")), F.lit("]"))
        )
        .alias("path"),
        F.coalesce(F.col("dist"), F.lit(-1)).alias("dist"),
    )


def bfs_min_paths(
    sources: DataFrame,
    edge: EdgeTable,
    *,
    max_hops: int = 30,
    prepared_edges: DataFrame | None = None,
) -> DataFrame:
    """BFS from every row of ``sources`` (column ``root``) along OUT edges.

    Returns (root, id, path array<bigint>, dist) for every reached vertex,
    where path is the lexicographically-smallest shortest path root→id
    (inclusive of both endpoints).  ``prepared_edges`` lets callers share one
    :func:`prepare_edges` frame across BFS variants.
    """
    edges = prepared_edges if prepared_edges is not None else prepare_edges(edge)
    seed = sources.select(
        F.col("root").cast("long").alias("root"),
        F.col("root").cast("long").alias("id"),
        F.array(F.col("root").cast("long")).alias("path"),
        F.lit(0).alias("dist"),
    ).dropDuplicates(["root"])

    # Lazy checkpoints throughout the loop: the count() that follows each
    # checkpoint is then ONE job that computes, persists, and truncates
    # lineage (eager=True + count() was two jobs per round — VERDICT r2).
    # Visited state = the list of per-round checkpointed frontiers; their
    # lazy union serves the anti-join.  (Re-checkpointing one growing
    # `visited` frame would rewrite O(V) rows every round — the union of
    # already-checkpointed pieces costs nothing extra.)
    seed_ck = seed.localCheckpoint(eager=False)
    # visited rows tracked with the frontier count as the newest round's
    # proxy (its own count is still in flight) — the broadcast cutover
    # may lag one round; bounded by a single round's growth.
    state = {"visited": seed_ck.select("root", "id"), "rows": 0}

    def build(frontier, hop, rows):
        f = F.broadcast(frontier) if rows <= _BROADCAST_MAX_ROWS else frontier
        v = (
            F.broadcast(state["visited"])
            if state["rows"] + rows <= _BROADCAST_MAX_ROWS
            else state["visited"]
        )
        return (
            f.join(edges, f["id"] == edges["__src"])
            .select(
                "root",
                F.col("__dst").alias("id"),
                F.concat(F.col("path"), F.array(F.col("__dst"))).alias("path"),
            )
            # Anti-join BEFORE the min-agg shuffle: the (root, id) key is
            # already present pre-agg and the anti filters whole groups, so
            # correctness is unchanged — but in a saturating BFS most
            # expanded rows target visited vertices, and the broadcast hash
            # anti (no shuffle) keeps them out of the round's one shuffle.
            .join(v, on=["root", "id"], how="left_anti")
            # Lexicographic-min concatenated path == concatenation of the min
            # prefix, so the per-round min is globally correct.
            .groupBy("root", "id")
            .agg(F.min("path").alias("path"))
            .withColumn("dist", F.lit(hop))
            .localCheckpoint(eager=False)
        )

    def on_round(expanded, frontier_rows):
        state["rows"] += frontier_rows
        state["visited"] = state["visited"].unionByName(
            expanded.select("root", "id")
        )

    return _union_all(
        _run_rounds(seed_ck, max_hops, build, on_round=on_round)
    )


def bfs_min_dists(
    sources: DataFrame,
    edge: EdgeTable,
    *,
    max_hops: int = 30,
    prepared_edges: DataFrame | None = None,
) -> DataFrame:
    """Distance-only BFS: (root, id, dist) per reached vertex.

    The path-free variant of :func:`bfs_min_paths` for queries that project
    only the distance — frontier rows are two longs, the per-round
    aggregation is a dropDuplicates instead of a lexicographic array min,
    and no concat/array state flows through the shuffle.

    Round order: the visited anti-join runs BEFORE the dedup shuffle.  In
    a saturating BFS most expanded rows point at already-visited vertices;
    the anti side is a broadcast hash lookup (no shuffle), so filtering
    first means the round's one shuffle (dropDuplicates) carries only the
    genuinely-new frontier instead of frontier×degree rows.

    Constant plan shape: round frames carry only (root, id) — ``dist`` is
    attached AFTER the loop from the round index — and visited is
    re-checkpointed to a flat scan each round instead of growing a union
    tree.  Every round then compiles the IDENTICAL plan (checkpoint scan
    ⋈ edges, anti broadcast checkpoint-scan, dedup): Catalyst analysis is
    over a fixed-depth tree and whole-stage codegen hits the Janino cache
    instead of generating a new class per hop.  Measured at sf0.1 this
    halves the per-round driver latency (plan 0.17-0.5 s → ~0.05 s); the
    per-round visited copy it buys is one |visited|-row narrow RDD union
    materialized inside the next round's job."""
    edges = prepared_edges if prepared_edges is not None else prepare_edges(edge)
    seed = sources.select(
        F.col("root").cast("long").alias("root"),
        F.col("root").cast("long").alias("id"),
    ).dropDuplicates(["root"])

    seed_ck = seed.localCheckpoint(eager=False)
    state = {"visited": seed_ck, "rows": 0}

    def build(frontier, hop, rows):
        f = F.broadcast(frontier) if rows <= _BROADCAST_MAX_ROWS else frontier
        v = (
            F.broadcast(state["visited"])
            if state["rows"] + rows <= _BROADCAST_MAX_ROWS
            else state["visited"]
        )
        return (
            f.join(edges, f["id"] == edges["__src"])
            .select("root", F.col("__dst").alias("id"))
            .join(v, on=["root", "id"], how="left_anti")
            .dropDuplicates(["root", "id"])
            .localCheckpoint(eager=False)
        )

    def on_round(expanded, frontier_rows):
        state["rows"] += frontier_rows
        # Flat re-checkpoint (lazy): materialized as a side input of the
        # NEXT round's job, so no extra driver-blocking job is added.
        state["visited"] = state["visited"].unionByName(expanded).localCheckpoint(
            eager=False
        )

    rounds = _run_rounds(seed_ck, max_hops, build, on_round=on_round)
    return _union_all(
        [r.withColumn("dist", F.lit(i)) for i, r in enumerate(rounds)]
    )


def bfs_meet_min_dists(
    sources: DataFrame,
    destinations: DataFrame,
    edge: EdgeTable,
    *,
    max_hops: int = 30,
    prepared_edges: DataFrame | None = None,
) -> DataFrame:
    """Bidirectional (meet-in-the-middle) pair distances: (root, dst, dist).

    For a bounded source×destination grid the hop-H reachability question
    splits exactly: every path of length L ≤ H has a vertex at forward
    distance ⌈H/2⌉ or less and backward distance ⌊H/2⌋ or less, so
    ``min over meet vertices of (fwd dist + bwd dist)`` is the true pair
    distance.  Two half-depth BFS runs replace one full-depth run —
    frontier sizes grow with depth, so each half explores far less than
    the full walk (the classic bidirectional-search √ saving) — and the
    two halves share no state, so they execute CONCURRENTLY on two
    driver threads (Spark schedules both job streams onto the same
    executor pool; on a cluster the stages interleave).  The backward
    BFS reuses the same prepared edge frame with src/dst flipped — no
    second edge materialization.

    Pairs with no meet within the hop budget are genuinely unreachable
    within ``max_hops`` (no row returned — callers grid-join and
    coalesce to their unreachable marker).
    """
    from concurrent.futures import ThreadPoolExecutor

    edges = prepared_edges if prepared_edges is not None else prepare_edges(edge)
    redges = edges.select(
        F.col("__dst").alias("__src"), F.col("__src").alias("__dst")
    )
    fwd_hops = (max_hops + 1) // 2
    bwd_hops = max_hops - fwd_hops
    with ThreadPoolExecutor(2) as pool:
        ffut = pool.submit(
            bfs_min_dists,
            sources,
            edge,
            max_hops=fwd_hops,
            prepared_edges=edges,
        )
        bfut = pool.submit(
            bfs_min_dists,
            destinations.select(F.col(destinations.columns[0]).alias("root")),
            edge,
            max_hops=bwd_hops,
            prepared_edges=redges,
        )
        fwd, bwd = ffut.result(), bfut.result()
    meet = fwd.join(
        bwd.select(
            F.col("root").alias("dst"),
            "id",
            F.col("dist").alias("__bdist"),
        ),
        on="id",
    )
    return meet.groupBy("root", "dst").agg(
        F.min(F.col("dist") + F.col("__bdist")).alias("dist")
    )


def canonical_min_paths(walk: DataFrame) -> DataFrame:
    """Reduce a simple-path enumeration to the canonical ANY SHORTEST answer:
    per (root, id), min dist then lexicographically-smallest path — exactly
    :func:`bfs_min_paths` output over the walk's roots/hop bound (struct min
    orders by dist first, then array-lexicographic path)."""
    return (
        walk.groupBy("root", "id")
        .agg(F.min(F.struct("dist", "path")).alias("__best"))
        .select(
            "root",
            "id",
            F.col("__best.path").alias("path"),
            F.col("__best.dist").alias("dist"),
        )
    )


def bfs_all_min_paths(
    sources: DataFrame,
    edge: EdgeTable,
    *,
    max_hops: int = 30,
    max_paths_per_pair: int | None = None,
    prepared_edges: DataFrame | None = None,
) -> DataFrame:
    """BFS keeping EVERY shortest path, not just the canonical one.

    Same wavefront structure as :func:`bfs_min_paths`, but the per-round
    aggregation keeps all distinct paths that reach a vertex on its
    first-reached hop (they are all shortest by BFS invariant).  Shortest-path
    counts can grow combinatorially in dense graphs; ``max_paths_per_pair``
    bounds the per-(root, id) fan-out with a rank-by-path cutoff (ranked so
    the retained subset is deterministic).

    Returns (root, id, path array<bigint>, dist) — one row per path.
    """
    from pyspark.sql import Window

    # Deduped upfront (prepare_edges): paths are vertex sequences, so
    # parallel duplicate edge rows are the ONLY source of duplicate paths —
    # one distinct() on the 2-column edge list replaces a wide-key
    # (root, id, path) dropDuplicates shuffle in EVERY round.
    edges = prepared_edges if prepared_edges is not None else prepare_edges(edge)
    seed = sources.select(
        F.col("root").cast("long").alias("root"),
        F.col("root").cast("long").alias("id"),
        F.array(F.col("root").cast("long")).alias("path"),
        F.lit(0).alias("dist"),
    ).dropDuplicates(["root"])

    seed_ck = seed.localCheckpoint(eager=False)
    state = {"visited": seed_ck.select("root", "id"), "rows": 0}

    def build(frontier, hop, rows):
        f = F.broadcast(frontier) if rows <= _BROADCAST_MAX_ROWS else frontier
        v = (
            F.broadcast(state["visited"])
            if state["rows"] + rows <= _BROADCAST_MAX_ROWS
            else state["visited"]
        )
        expanded = (
            f.join(edges, f["id"] == edges["__src"])
            .select(
                "root",
                F.col("__dst").alias("id"),
                F.concat(F.col("path"), F.array(F.col("__dst"))).alias("path"),
            )
            .join(v, on=["root", "id"], how="left_anti")
        )
        if max_paths_per_pair is not None:
            w = Window.partitionBy("root", "id").orderBy("path")
            expanded = (
                expanded.withColumn("__rk", F.row_number().over(w))
                .where(F.col("__rk") <= max_paths_per_pair)
                .drop("__rk")
            )
        return expanded.withColumn("dist", F.lit(hop)).localCheckpoint(
            eager=False
        )

    def on_round(expanded, frontier_rows):
        state["rows"] += frontier_rows
        state["visited"] = state["visited"].unionByName(
            expanded.select("root", "id").dropDuplicates()
        )

    return _union_all(
        _run_rounds(seed_ck, max_hops, build, on_round=on_round)
    )


def all_shortest(
    sources: DataFrame,
    destinations: DataFrame,
    edge: EdgeTable,
    *,
    max_hops: int = 30,
    max_paths_per_pair: int | None = None,
    prepared_edges: DataFrame | None = None,
) -> DataFrame:
    """ALL SHORTEST: every shortest path per (source, destination) pair.

    EXTENSION — the reference parses ALL SHORTEST but its planner rejects it
    (planner/core/logical_plan_builder.go:6567-6577); this engine executes
    it.  Output shape matches :func:`any_shortest` (src_id, dst_id, path
    string, dist) with one row PER PATH; unreachable pairs get one
    ``"Unreachable"`` / -1 row.
    """
    reached = bfs_all_min_paths(
        sources,
        edge,
        max_hops=max_hops,
        max_paths_per_pair=max_paths_per_pair,
        prepared_edges=prepared_edges,
    )
    return pair_results(reached, sources, destinations)


def min_dist_paths(walk: DataFrame) -> DataFrame:
    """Filter a simple-path enumeration down to all SHORTEST paths.

    Every shortest path is simple and every prefix of a shortest path is
    itself a shortest path, so filtering :func:`enumerate_simple_paths`
    output to ``dist == min dist per (root, id)`` yields exactly the set
    :func:`bfs_all_min_paths` computes — letting one cached walk serve both
    ALL SHORTEST and TOP k.
    """
    mind = walk.groupBy("root", "id").agg(F.min("dist").alias("__mind"))
    return (
        walk.join(mind, on=["root", "id"])
        .where(F.col("dist") == F.col("__mind"))
        .drop("__mind")
    )


def enumerate_simple_paths(
    sources: DataFrame,
    edge: EdgeTable,
    *,
    max_hops: int,
    prepared_edges: DataFrame | None = None,
    max_paths_per_round: int = 50_000_000,
) -> DataFrame:
    """Exhaustive bounded-hop simple-path enumeration from every root.

    Returns (root, id, path array<bigint>, dist) — one row per simple path
    (no vertex revisited) of length ≤ ``max_hops``, including the dist-0
    seed path ``[root]``.  This is the exact (beam-free) search space of
    TOP k, and via :func:`min_dist_paths` also yields ALL SHORTEST — callers
    can cache one enumeration and serve both.

    ``max_paths_per_round`` is the combinatorial-explosion guard: simple-
    path counts grow with branching-factor^hops on dense graphs, and an
    unbounded enumeration would silently run until the cluster falls over.
    The per-round frontier count (already materialized for the loop) is
    checked against the cap and raises with the beam-search escape hatch
    rather than melting down — zero added cost on healthy inputs.
    """
    edges = prepared_edges if prepared_edges is not None else prepare_edges(edge)
    seed = sources.select(
        F.col("root").cast("long").alias("root"),
        F.col("root").cast("long").alias("id"),
        F.array(F.col("root").cast("long")).alias("path"),
        F.lit(0).alias("dist"),
    ).dropDuplicates(["root"])

    seed_ck = seed.localCheckpoint(eager=False)

    def build(frontier, hop, rows):
        f = F.broadcast(frontier) if rows <= _BROADCAST_MAX_ROWS else frontier
        return (
            f.join(edges, f["id"] == edges["__src"])
            .where(~F.array_contains(F.col("path"), F.col("__dst")))
            .select(
                "root",
                F.col("__dst").alias("id"),
                F.concat(F.col("path"), F.array(F.col("__dst"))).alias("path"),
                (F.col("dist") + 1).alias("dist"),
            )
            .localCheckpoint(eager=False)
        )

    def guard(rows, hop):
        if rows > max_paths_per_round:
            raise ValueError(
                f"enumerate_simple_paths: round {hop} holds "
                f"{rows} live paths (> max_paths_per_round="
                f"{max_paths_per_round}) — the graph is too dense for "
                "exhaustive enumeration at this hop bound; use "
                "top_k_shortest(beam=...) or lower max_hops"
            )

    return _union_all(_run_rounds(seed_ck, max_hops, build, guard=guard))


def top_k_shortest(
    sources: DataFrame,
    destinations: DataFrame,
    edge: EdgeTable,
    *,
    k: int,
    max_hops: int = 30,
    beam: int | None = None,
    walk: DataFrame | None = None,
    max_paths_per_round: int = 50_000_000,
) -> DataFrame:
    """TOP k shortest simple paths per (source, destination) pair.

    EXTENSION — the reference parses TOP k but its planner rejects it
    (planner/core/logical_plan_builder.go:6567-6577); this engine executes
    it.  Per round, every live path extends along OUT edges (cycle-free —
    a path may not revisit a vertex); after ``max_hops`` rounds a window
    rank keeps the k best (dist, path) per pair.

    ``beam=None`` (default) enumerates ALL simple paths up to ``max_hops``
    — exact, and fine for the bounded-hop queries TOP k is used with.
    ``beam=b`` (b ≥ k) additionally prunes to the b best (dist, path) per
    (root, vertex) each round — the standard k-shortest beam relaxation
    for long-horizon searches on dense graphs, where exhaustive
    enumeration would explode; exact whenever every true top-k path's
    prefix ranks within b at each intermediate vertex (always true for
    k = b = 1, which degenerates to BFS).

    Returns (src_id, dst_id, path string, dist, rank 1..k), shortest
    first; pairs with no path within ``max_hops`` are absent (TOP k
    enumerates paths — it does not assert reachability the way ANY/ALL
    SHORTEST do).
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("top_k_shortest: k must be >= 1")
    if beam is not None and beam < k:
        raise ValueError("top_k_shortest: beam must be >= k")
    if walk is not None and beam is not None:
        raise ValueError(
            "top_k_shortest: a precomputed walk is the exact search space — "
            "beam pruning does not apply"
        )
    w = Window.partitionBy("root", "id").orderBy("dist", "path")

    if walk is not None:
        state = walk
    elif beam is None:
        state = enumerate_simple_paths(
            sources,
            edge,
            max_hops=max_hops,
            max_paths_per_round=max_paths_per_round,
        )
    else:
        edges = prepare_edges(edge)
        seed = sources.select(
            F.col("root").cast("long").alias("root"),
            F.col("root").cast("long").alias("id"),
            F.array(F.col("root").cast("long")).alias("path"),
            F.lit(0).alias("dist"),
        ).dropDuplicates(["root"])

        frontier = seed.localCheckpoint(eager=False)
        rounds = [frontier]
        frontier_rows = frontier.count()

        for _hop in range(1, max_hops + 1):
            if frontier_rows == 0:
                break
            f = (
                F.broadcast(frontier)
                if frontier_rows <= _BROADCAST_MAX_ROWS
                else frontier
            )
            expanded = (
                f.join(edges, f["id"] == edges["__src"])
                .where(~F.array_contains(F.col("path"), F.col("__dst")))
                .select(
                    "root",
                    F.col("__dst").alias("id"),
                    F.concat(F.col("path"), F.array(F.col("__dst"))).alias(
                        "path"
                    ),
                    (F.col("dist") + 1).alias("dist"),
                )
            )
            # Paths from earlier rounds have strictly smaller dist, so they
            # always outrank this round's candidates — ranking new candidates
            # against the accumulated state only needs the state's per-vertex
            # OCCUPANCY, not a re-rank of old rows (old rows never fall out).
            acc = rounds[0].select("root", "id")
            for r in rounds[1:]:
                acc = acc.unionByName(r.select("root", "id"))
            occupancy = acc.groupBy("root", "id").agg(
                F.count(F.lit(1)).alias("__held")
            )
            expanded = (
                expanded.join(occupancy, on=["root", "id"], how="left")
                .withColumn("__rk", F.row_number().over(w))
                .where(
                    F.col("__rk") + F.coalesce(F.col("__held"), F.lit(0))
                    <= beam
                )
                .drop("__rk", "__held")
                .localCheckpoint(eager=False)
            )
            frontier_rows = expanded.count()
            if frontier_rows:
                rounds.append(expanded)
            frontier = expanded

        state = rounds[0]
        for r in rounds[1:]:
            state = state.unionByName(r)
    ranked = state.withColumn("__rk", F.row_number().over(w)).where(
        F.col("__rk") <= k
    )
    pairs = sources.select(F.col("root").cast("long").alias("src_id")).crossJoin(
        destinations.select(F.col("dst_id").cast("long").alias("dst_id"))
    )
    return (
        ranked.select(
            F.col("root").alias("src_id"),
            F.col("id").alias("dst_id"),
            F.concat(
                F.lit("["), F.concat_ws(",", F.col("path")), F.lit("]")
            ).alias("path"),
            "dist",
            F.col("__rk").alias("rank"),
        )
        .join(pairs, on=["src_id", "dst_id"], how="left_semi")
    )


def any_shortest(
    sources: DataFrame,
    destinations: DataFrame,
    edge: EdgeTable,
    *,
    max_hops: int = 30,
    prepared_edges: DataFrame | None = None,
) -> DataFrame:
    """All (source, destination) pairs with the canonical shortest path.

    ``sources``/``destinations``: one column ``root`` / ``dst_id``.
    Output: (src_id, dst_id, path string, dist; dist = -1 and
    ``"Unreachable"`` when no path within ``max_hops``) — the path-string
    format of ``deliverRes`` (graph_shortest.go:93-106).
    """
    reached = bfs_min_paths(
        sources, edge, max_hops=max_hops, prepared_edges=prepared_edges
    )
    return pair_results(reached, sources, destinations)


def bounded_cheapest(
    sources: DataFrame,
    weighted_edges: DataFrame,
    *,
    max_hops: int = 4,
) -> DataFrame:
    """Cheapest cost within ≤ ``max_hops`` edges: frontier-pruned
    Bellman-Ford (the weighted extension of the reference's ANY SHORTEST,
    graph_shortest.go — its planner has no CHEAPEST; extension).

    ``weighted_edges`` is (__src, __dst, __w long).  State is one row per
    (root, vertex) holding the best (cost, hops) — lexicographic struct
    min, so ties on cost resolve to fewest hops, deterministically.  Each
    round relaxes only rows improved last round (textbook queue
    optimization; the hop-order invariant — after round r, state = min
    cost over ≤ r-edge walks — is preserved).  Scale: state is bounded by
    |roots|×|V| two-long rows, rounds by ``max_hops``; every step is a
    keyed join + map-side-combined aggregate, no driver-side rows beyond
    the per-round 1-row count."""
    seed = (
        sources.select(
            F.col("root").cast("long").alias("root"),
            F.col("root").cast("long").alias("id"),
            F.lit(0).cast("long").alias("cost"),
            F.lit(0).alias("hops"),
        )
        .dropDuplicates(["root"])
        .localCheckpoint(eager=False)
    )
    state = {"dists": seed}

    def build(frontier, hop, rows):
        f = F.broadcast(frontier) if rows <= _BROADCAST_MAX_ROWS else frontier
        cand = (
            f.join(weighted_edges, f["id"] == weighted_edges["__src"])
            .select(
                "root",
                F.col("__dst").alias("id"),
                (F.col("cost") + F.col("__w")).alias("cost"),
                (F.col("hops") + 1).alias("hops"),
            )
            .groupBy("root", "id")
            .agg(F.min(F.struct("cost", "hops")).alias("s"))
            .select(
                "root", "id",
                F.col("s.cost").alias("cost"),
                F.col("s.hops").alias("hops"),
            )
        )
        best = state["dists"].select("root", "id", F.col("cost").alias("__bc"))
        return (
            cand.join(best, on=["root", "id"], how="left")
            .where(F.col("__bc").isNull() | (F.col("cost") < F.col("__bc")))
            .drop("__bc")
            .localCheckpoint(eager=False)
        )

    def on_round(improved, frontier_rows):
        # Re-min over the union keeps one row per (root, id); flat
        # re-checkpoint keeps every round's plan the same shape
        # (materialized inside the next round's job).
        state["dists"] = (
            state["dists"]
            .unionByName(improved)
            .groupBy("root", "id")
            .agg(F.min(F.struct("cost", "hops")).alias("s"))
            .select(
                "root", "id",
                F.col("s.cost").alias("cost"),
                F.col("s.hops").alias("hops"),
            )
            .localCheckpoint(eager=False)
        )

    _run_rounds(seed, max_hops, build, on_round=on_round)
    return state["dists"]


def pagerank_int(
    weighted_or_plain_edges: DataFrame,
    *,
    iters: int = 5,
    base: int = 150_000,
    damp_num: int = 17,
    damp_den: int = 20,
    init: int = 1_000_000,
    personalize: tuple[int, ...] | None = None,
) -> DataFrame:
    """Integer-exact PageRank power iteration (extension — the reference
    has no iterative graph analytics beyond shortest paths; this reuses
    the same prepared-edge machinery).

    All arithmetic is integer: per-edge contribution is ``score DIV
    out_degree`` and the damping step is ``base + (damp_num * Σcontrib)
    DIV damp_den`` — deterministic and bit-identical in any engine, which
    is what makes the unrolled-CTE oracle exact (FP PageRank is
    fold-order-sensitive).  Sink vertices (no out-edges) leak rank, as in
    the simplified textbook formulation — mirrored identically by the
    oracle.  Scale: per round one keyed join (scores × out-edges) + one
    map-side-combined sum, state = |V| two-long rows; rounds are a fixed
    constant, so the whole run is ``iters`` linear passes.

    NOT pre-partitioned on the join keys (r12 negative result): unlike
    LPA — whose rounds execute one at a time, so its edge frame must
    carry its partitioning across round boundaries — the whole
    ``iters``-round loop here is ONE unrolled plan, and AQE's
    ReusedExchange already shares the per-round verts/edges exchanges
    at runtime; an interleaved A/B of repartition(key) before both
    checkpoints measured 1.81 → 2.15 s (two extra setup shuffles, no
    per-round saving left to collect)."""
    edges = weighted_or_plain_edges.select("__src", "__dst")
    verts = (
        edges.select(F.col("__src").alias("id"))
        .unionByName(edges.select(F.col("__dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
    edges_d = edges.join(deg, "__src").localCheckpoint(eager=True)
    if personalize is not None:
        # Personalized PageRank (random walk with restart): initial mass
        # and the teleport/base term live ONLY on the source set — the
        # one-line delta from global PageRank in this integer scheme.
        in_s = F.col("id").isin(*personalize)
        s = verts.withColumn(
            "score",
            F.when(in_s, F.lit(init)).otherwise(F.lit(0)).cast("long"),
        )
    else:
        s = verts.withColumn("score", F.lit(init).cast("long"))
    for _ in range(iters):
        sums = (
            s.join(edges_d, s["id"] == edges_d["__src"])
            .select(
                F.col("__dst").alias("id"),
                F.expr("score div __deg").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("t"))
        )
        base_col = (
            F.when(F.col("id").isin(*personalize), F.lit(base)).otherwise(
                F.lit(0)
            )
            if personalize is not None
            else F.lit(base)
        )
        s = verts.join(sums, "id", "left").select(
            "id",
            (
                base_col
                + F.expr(
                    f"({damp_num} * coalesce(t, 0)) div {damp_den}"
                )
            )
            .cast("long")
            .alias("score"),
        )
    return s
