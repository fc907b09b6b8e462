"""Unit tests for the pipelined round driver (operators/rounds.py) and
small dedup helpers — pure Python, no SparkSession."""

from tidb_spark.data.dedup import _parse_byte_size
from tidb_spark.operators.rounds import run_rounds


class _Fake:
    """Stands in for a lazily-checkpointed round frame."""

    def __init__(self, rows: int):
        self.rows = rows

    def count(self) -> int:
        return self.rows


def test_parse_byte_size_forms():
    """ADVICE r6 (low): spark.sql.files.maxPartitionBytes accepts
    human-readable sizes ('128m', '512MB') — parse them instead of
    crashing on int()."""
    assert _parse_byte_size("134217728") == 134217728
    assert _parse_byte_size(134217728) == 134217728
    assert _parse_byte_size("128m") == 128 << 20
    assert _parse_byte_size("512MB") == 512 << 20
    assert _parse_byte_size("1g") == 1 << 30
    assert _parse_byte_size(" 64k ") == 64 << 10
    assert _parse_byte_size("134217728b") == 134217728
    assert _parse_byte_size("nonsense") is None
    assert _parse_byte_size("12.5m") is None


def test_run_rounds_replan_hook_consulted():
    """ADVICE r6 (low): callers whose builds size an accumulated set
    from the stale estimate report that decision via ``replan`` — the
    driver re-plans (build called twice, exact count) when it fires."""
    builds: list[tuple[int, int]] = []
    produced = {1: 5, 2: 3}

    def build(frontier, n, rows):
        builds.append((n, rows))
        return _Fake(produced.get(n, 0))

    rounds = run_rounds(
        _Fake(2), 10, build, replan=lambda est, exact: est != exact
    )
    # rounds: seed(2), r1(5), r2(3); r3 produced 0 rows -> excluded
    assert [r.rows for r in rounds] == [2, 5, 3]
    # every round whose estimate was stale rebuilt once with the exact
    # count: (1, 0)->(1, 2), (2, 2)->(2, 5), (3, 5)->(3, 3)
    assert builds == [(1, 0), (1, 2), (2, 2), (2, 5), (3, 5), (3, 3), (4, 3)]


def test_run_rounds_no_replan_without_hook():
    """Within-threshold estimate drift alone must NOT re-plan (the
    overlap is latency-only when no size decision flips)."""
    builds: list[tuple[int, int]] = []
    produced = {1: 5, 2: 3}

    def build(frontier, n, rows):
        builds.append((n, rows))
        return _Fake(produced.get(n, 0))

    rounds = run_rounds(_Fake(2), 10, build)
    assert [r.rows for r in rounds] == [2, 5, 3]
    assert builds == [(1, 0), (2, 2), (3, 5), (4, 3)]


def test_k_core_basic_and_fallback(spark, monkeypatch):
    """k=2 core of a 4-clique with two pendant chains: the clique survives
    with in-core degree 3, everything on the chains peels off.  Run once
    through the literal-batch path and once with _COLLECT_MAX forced to 0
    so every round takes the mass-removal shuffle fallback — identical
    results."""
    from pyspark.sql import functions as F

    from tidb_spark.graph import core as gc

    clique = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    chain = [(3, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, ["a", "b"])

    expect = {(i, 3) for i in range(4)}
    got = {
        (r.v, r.core_degree) for r in gc.k_core(edges, 2).collect()
    }
    assert got == expect

    monkeypatch.setattr(gc, "_COLLECT_MAX", 0)
    got_fb = {
        (r.v, r.core_degree) for r in gc.k_core(edges, 2).collect()
    }
    assert got_fb == expect

    # no 99-core exists -> empty frame, not an error
    assert gc.k_core(edges, 99).count() == 0


def test_cte_recursive_unroll_matches_generic_loop(spark):
    """r13: cte_recursive's depth-bounded linear unroll must stay
    row-identical to the generic recursive_cte fixpoint loop it replaced
    (same seed, same step, UNION-DISTINCT on id) — including on a graph
    where the frontier dies out BEFORE the depth bound, the case the
    loop's convergence count used to catch early."""
    from functools import reduce

    from pyspark.sql import functions as F

    from tidb_spark.operators.cte import recursive_cte

    def both(edge_rows, seed_ids, max_depth=3):
        edges = spark.createDataFrame(edge_rows, ["src", "dst"])
        seed = spark.createDataFrame(
            [(i, 0) for i in seed_ids], ["id", "depth"]
        )

        def step(frontier):
            return (
                frontier.where(F.col("depth") < max_depth)
                .join(edges, frontier["id"] == edges["src"])
                .select(
                    F.col("dst").alias("id"),
                    (F.col("depth") + 1).alias("depth"),
                )
            )

        loop = recursive_cte(seed, step, distinct_keys=["id"])

        levels, seen, frontier = [seed], seed.select("id"), seed
        for _ in range(max_depth):
            nxt = (
                frontier.where(F.col("depth") < max_depth)
                .join(edges, frontier["id"] == edges["src"])
                .select(
                    F.col("dst").alias("id"),
                    (F.col("depth") + 1).alias("depth"),
                )
                .dropDuplicates(["id"])
                .join(seen, on="id", how="left_anti")
            )
            levels.append(nxt)
            seen = seen.unionByName(nxt.select("id"))
            frontier = nxt
        unroll = reduce(lambda a, b: a.unionByName(b), levels)
        return (
            sorted(map(tuple, loop.collect())),
            sorted(map(tuple, unroll.collect())),
        )

    # diamond + revisit: 1->2->4, 1->3->4 (4 reached once, at min depth),
    # 4->1 (cycle back into the seed, must be dropped by the seen set)
    a, b = both([(1, 2), (1, 3), (2, 4), (3, 4), (4, 1), (4, 5), (5, 6)], [1])
    assert a == b == [(1, 0), (2, 1), (3, 1), (4, 2), (5, 3)]

    # frontier dies out at depth 1, well before the depth-3 bound
    a, b = both([(1, 2)], [1])
    assert a == b == [(1, 0), (2, 1)]

    # empty step from the start
    a, b = both([(7, 8)], [1])
    assert a == b == [(1, 0)]


def test_spread_small_width_is_size_derived(spark):
    """r13: spread_small's fan-out follows the input size (one task per
    _SPREAD_BYTES_PER_TASK) capped at defaultParallelism, instead of
    always fanning to every core — tiny corpora must not fragment into
    launch-overhead-dominated tasks."""
    import tidb_spark.data.dedup as dd

    dp = spark.sparkContext.defaultParallelism

    def width(df):
        out = dd.spread_small(df, "k")
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        return out.rdd.getNumPartitions(), size

    # small input: width = max(2, ceil(size / bpt)), capped by cores
    small = spark.createDataFrame([(i, "x" * 50) for i in range(200)], ["k", "v"])
    w, size = width(small)
    expect = min(dp, max(2, -(-size // dd._SPREAD_BYTES_PER_TASK)))
    assert w == expect, (w, expect, size)

    # bigger input: enough bytes that the core cap binds again
    big = spark.createDataFrame(
        [(i, "x" * 4000) for i in range(dp * dd._SPREAD_BYTES_PER_TASK // 4000 + 64)],
        ["k", "v"],
    )
    w, size = width(big)
    assert size >= dp * dd._SPREAD_BYTES_PER_TASK
    assert w == dp, (w, dp, size)
