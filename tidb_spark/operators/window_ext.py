"""GROUPS window frames — an EXTENSION past reference parity.

The reference's parser accepts ``GROUPS BETWEEN n PRECEDING AND m
FOLLOWING`` but its planner rejects it (same posture as ALL SHORTEST /
TOP k, which this engine also executes); Spark has no native GROUPS
frame either.  The SQL:2011 semantics: the frame spans whole PEER GROUPS
(rows tying on the ORDER BY key), n groups back through m groups
forward.

Emulation: a peer group's index IS ``dense_rank()`` over the same
(partition, order); a GROUPS frame of ±n groups is then exactly a RANGE
frame of ±n over that integer rank.  Two window functions over one
partitioning — a single shuffle, both windows evaluated in the same
sorted pass (Catalyst fuses same-spec windows), no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def groups_frame(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    agg: Column,
    *,
    preceding: int,
    following: int,
    out_col: str = "groups_agg",
) -> DataFrame:
    """``agg OVER (PARTITION BY … ORDER BY … GROUPS BETWEEN <preceding>
    PRECEDING AND <following> FOLLOWING)``.

    ``agg`` is an unevaluated aggregate Column (e.g. ``F.sum("x")``);
    ``preceding``/``following`` count PEER GROUPS (0 = current group;
    use a large value like 1 << 30 for UNBOUNDED).
    """
    if preceding < 0 or following < 0:
        raise ValueError("groups_frame: bounds count groups, must be >= 0")
    w_rank = Window.partitionBy(*partition_by).orderBy(*order_by)
    ranked = df.withColumn("__grp", F.dense_rank().over(w_rank))
    w_groups = (
        Window.partitionBy(*partition_by)
        .orderBy("__grp")
        .rangeBetween(-preceding, following)
    )
    return ranked.withColumn(out_col, agg.over(w_groups)).drop("__grp")
