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
``@@cte_max_recursion_depth`` guard.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

DEFAULT_MAX_ITERATION = 1000

# Same adaptive-broadcast policy as graph/shortest.py: visited/accumulated
# sets at or below this many rows broadcast into the per-round anti-join.
_BROADCAST_MAX_ROWS = 2_000_000


def recursive_cte(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    *,
    distinct_keys: list[str] | None = None,
    max_iteration: int = DEFAULT_MAX_ITERATION,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Compute the fixpoint of ``seed UNION [DISTINCT] step(frontier)``.

    ``distinct_keys``: UNION-DISTINCT semantics over these columns (rows whose
    keys already appeared in any earlier round are dropped, PostgreSQL/DuckDB
    ``WITH RECURSIVE ... UNION`` behavior — also the reference's dedup mode,
    ``executor/cte.go`` hashtable dedup).  ``None`` = UNION ALL semantics.

    Returns the accumulated result with the seed's schema.
    """
    from pyspark.sql import functions as F

    columns = seed.columns
    if distinct_keys is not None:
        seed = seed.dropDuplicates(distinct_keys)
    # Accumulated state = the list of per-round checkpointed frames; their
    # lazy union serves reads.  (Re-checkpointing one growing frame would
    # rewrite O(result) rows every round; the union of already-materialized
    # pieces costs nothing extra.)
    # Lazy checkpoint + count = one job that computes, persists, and
    # truncates lineage (eager + count was two jobs per round).
    rounds = [seed.localCheckpoint(eager=False)]
    accumulated_rows = rounds[0].count()
    frontier = rounds[0]

    def _accumulated() -> DataFrame:
        out = rounds[0]
        for r in rounds[1:]:
            out = out.unionByName(r)
        return out

    for iteration in range(max_iteration):
        produced = step(frontier).select(*columns)
        if distinct_keys is not None:
            seen = _accumulated().select(*distinct_keys)
            # Small accumulated sets broadcast into the anti-join (no
            # shuffle); past the threshold fall back to a shuffled anti-join
            # — the row counts are free, every piece is checkpointed.
            if accumulated_rows <= _BROADCAST_MAX_ROWS:
                seen = F.broadcast(seen)
            produced = produced.dropDuplicates(distinct_keys).join(
                seen, on=distinct_keys, how="left_anti"
            )
        if checkpoint_every and iteration % checkpoint_every == 0:
            produced = produced.localCheckpoint(eager=False)
        produced_rows = produced.count()
        if produced_rows == 0:
            return _accumulated()
        rounds.append(produced)
        accumulated_rows += produced_rows
        frontier = produced
    raise RuntimeError(
        f"recursive_cte: no fixpoint after {max_iteration} iterations "
        "(reference errors likewise at @@cte_max_recursion_depth)"
    )
