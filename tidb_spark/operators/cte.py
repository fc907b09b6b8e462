"""Recursive-CTE fixpoint runner.

The reference executes ``WITH RECURSIVE`` with CTEExec: a seed executor fills
``iterInTbl``, then the recursive executor iterates, feeding each round's
output back in until an empty round or MaxIteration
(``executor/cte.go:38-51,60``).  Spark SQL has no recursive CTE, so this is a
driver-side iteration over DataFrames — the loop is control flow only; every
round's work (join/filter/dedup) is a distributed Spark job.

Scale notes (100 TB): each round's frontier is repartitioned by the dedup
keys so the anti-join against the accumulated set co-partitions;
``localCheckpoint`` truncates lineage so plan size stays O(1) in rounds
instead of O(rounds); MAX_ITERATION mirrors the reference's
``@@cte_max_recursion_depth`` guard.  Round latency is handled by the
shared pipelined driver (``operators/rounds.py``): the round-boundary
count job overlaps the next round's plan construction, and the seen-keys
frame is re-checkpointed flat each round so every round compiles the
identical plan shape (Janino codegen cache hit).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from tidb_spark.operators.rounds import BROADCAST_MAX_ROWS, run_rounds

DEFAULT_MAX_ITERATION = 1000


def recursive_cte(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    *,
    distinct_keys: list[str] | None = None,
    max_iteration: int = DEFAULT_MAX_ITERATION,
) -> DataFrame:
    """Compute the fixpoint of ``seed UNION [DISTINCT] step(frontier)``.

    ``distinct_keys``: UNION-DISTINCT semantics over these columns (rows whose
    keys already appeared in any earlier round are dropped, PostgreSQL/DuckDB
    ``WITH RECURSIVE ... UNION`` behavior — also the reference's dedup mode,
    ``executor/cte.go`` hashtable dedup).  ``None`` = UNION ALL semantics.

    ``step`` must purely construct the round's plan (it may be invoked
    twice for one round when the pipelined driver re-plans on a broadcast
    threshold crossing — see ``operators/rounds.py``).

    Returns the accumulated result with the seed's schema.
    """
    from pyspark.sql import functions as F

    columns = seed.columns
    if distinct_keys is not None:
        seed = seed.dropDuplicates(distinct_keys)
    seed_ck = seed.localCheckpoint(eager=False)
    state = {
        "seen": (
            seed_ck.select(*distinct_keys).localCheckpoint(eager=False)
            if distinct_keys is not None
            else None
        ),
        "rows": 0,
    }

    def build(frontier, n, rows):
        produced = step(frontier).select(*columns)
        if distinct_keys is not None:
            seen = state["seen"]
            # Small accumulated sets broadcast into the anti-join (no
            # shuffle); past the threshold fall back to a shuffled
            # anti-join.
            if state["rows"] + rows <= BROADCAST_MAX_ROWS:
                seen = F.broadcast(seen)
            produced = produced.dropDuplicates(distinct_keys).join(
                seen, on=distinct_keys, how="left_anti"
            )
        return produced.localCheckpoint(eager=False)

    def on_round(produced, frontier_rows):
        state["rows"] += frontier_rows
        if distinct_keys is not None:
            # Flat re-checkpoint (lazy, materialized inside the next
            # round's job): keeps the anti-join input a single scan, so
            # every round's plan is the same shape.
            state["seen"] = (
                state["seen"]
                .unionByName(produced.select(*distinct_keys))
                .localCheckpoint(eager=False)
            )

    def guard(rows, rounds_done):
        if rounds_done >= max_iteration and rows > 0:
            raise RuntimeError(
                f"recursive_cte: no fixpoint after {max_iteration} "
                "iterations (reference errors likewise at "
                "@@cte_max_recursion_depth)"
            )

    def replan(estimate, exact):
        # build() sizes the seen-set broadcast from state["rows"] +
        # frontier estimate; re-plan when the exact count flips THAT
        # decision too, not just the frontier-side one (r6 ADVICE).
        return (state["rows"] + estimate <= BROADCAST_MAX_ROWS) != (
            state["rows"] + exact <= BROADCAST_MAX_ROWS
        )

    rounds = run_rounds(
        seed_ck,
        max_iteration,
        build,
        on_round=on_round,
        guard=guard,
        replan=replan if distinct_keys is not None else None,
    )
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out
