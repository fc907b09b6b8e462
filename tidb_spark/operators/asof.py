"""As-of (point-in-time) join — a time-series operator Spark lacks
natively.

For each left row, attach the single right row with the same key whose
time is the latest at-or-before (``direction="backward"``) or earliest
at-or-after (``"forward"``) the left row's time, optionally bounded by a
``tolerance``.

Spark-first formulation: NOT a join at all.  Tag both sides, union on
(key, time), and run ``last(right_payload, ignorenulls=True)`` over a
per-key time-ordered window — one shuffle on the key, no pair
enumeration, no range-join explosion.  A sort-merge range join would
re-scan right rows per left row; the union-window plan is linear in
|left| + |right| per key and survives 100 TB as long as single keys fit
a partition (the same contract windowed aggregation already has; salt
pathological keys upstream).

Ties: a right row whose time EQUALS the left row's time is eligible
(inclusive bound), and among equal right times the last in (time,
side)-order wins — deterministic because the union sorts by (time,
side_marker) with right rows first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_T = "__asof_t"
_SIDE = "__asof_side"
_PAY = "__asof_pay"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row survives; matched right columns
    (all of them, key/time included) appear suffixed, NULL when no right
    row qualifies.

    ``tolerance_us``: maximum |left_time - right_time| in microseconds;
    matches farther away are nulled out (pandas ``merge_asof`` contract).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    lcols = left.columns
    rcols = right.columns

    lt = F.col(left_time).cast("timestamp")
    rt = F.col(right_time).cast("timestamp")
    l_tag = left.select(
        *[F.col(c) for c in on],
        F.unix_micros(lt).alias(_T),
        F.lit(1).alias(_SIDE),
        F.struct(*[F.col(c) for c in lcols]).alias("__asof_l"),
        F.lit(None)
        .cast(
            right.select(
                F.struct(*[F.col(c) for c in rcols]).alias(_PAY)
            ).schema[_PAY].dataType
        )
        .alias(_PAY),
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        F.unix_micros(rt).alias(_T),
        F.lit(0).alias(_SIDE),
        F.lit(None)
        .cast(
            left.select(
                F.struct(*[F.col(c) for c in lcols]).alias("__asof_l")
            ).schema["__asof_l"].dataType
        )
        .alias("__asof_l"),
        F.struct(*[F.col(c) for c in rcols]).alias(_PAY),
    )
    u = l_tag.unionByName(r_tag)

    # backward: right rows sort before left rows at equal time (side 0 <
    # 1), so last() at the left row sees at-or-before matches.  forward:
    # reverse time, keep the same side order — earliest at-or-after wins.
    if direction == "backward":
        order = [F.col(_T).asc(), F.col(_SIDE).asc()]
    else:
        order = [F.col(_T).desc(), F.col(_SIDE).asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w)).where(
        F.col(_SIDE) == 1
    )

    if tolerance_us is not None:
        gap = F.abs(
            F.col(_T) - F.unix_micros(F.col(_PAY)[right_time].cast("timestamp"))
        )
        matched = matched.withColumn(
            _PAY, F.when(gap <= F.lit(tolerance_us), F.col(_PAY))
        )

    out = [F.col("__asof_l")[c].alias(c) for c in lcols]
    out += [F.col(_PAY)[c].alias(f"{c}{suffix}") for c in rcols]
    return matched.select(*out)
