"""Bucketed numeric range (interval) join — the scale path for
``point BETWEEN lo AND hi`` predicates.

A naive range join is a cross product with a filter: |P|·|I| pair
enumerations, which is exactly the plan Spark (and the reference's
planner) falls back to for a pure non-equi predicate.  At 100 TB that is
not a slow plan, it is a non-plan.

Spark-first formulation: quantize the value domain into buckets of
width >= the maximum interval length, so every interval overlaps at most
two buckets.  Explode each interval to the (<=2) bucket ids it covers,
map each point to its single bucket id, equi-join on the bucket id, and
re-check the exact BETWEEN predicate.  Catalyst executes this as an
ordinary shuffled hash/sort-merge join keyed on the bucket — work is
O(|P| + |I| + |matches|) plus a small constant duplication factor,
instead of O(|P|·|I|).  Skewed value regions shard across buckets by
construction; AQE's skew-join split handles a single hot bucket.

No duplicate elimination is needed: an interval's covered bucket ids are
distinct, and a point lives in exactly one bucket, so each qualifying
(interval, point) pair is produced exactly once.

The reference evaluates such predicates as Selection over a cartesian
Apply (executor/join.go nested-loop path); this module exists to make
the same semantics linear, per the brief's "range join" extension list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner-join `points` to `intervals` on
    ``lo_col <= point_col <= hi_col`` (inclusive both ends).

    ``bucket_width`` MUST be >= max(hi - lo); intervals wider than one
    bucket are still correct (the explode covers every bucket they
    touch) but the <=2-buckets-per-interval guarantee — and with it the
    constant duplication factor — holds only under that contract.

    Column sets of the two inputs must be disjoint (standard join
    hygiene; rename upstream).
    """
    w = float(bucket_width)
    p = points.withColumn(_BUCKET, F.floor(F.col(point_col) / F.lit(w)))
    i = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)),
                F.floor(F.col(hi_col) / F.lit(w)),
            )
        ),
    )
    joined = p.join(i, on=_BUCKET, how="inner").where(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    return joined.drop(_BUCKET)
