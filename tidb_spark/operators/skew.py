"""Skew-aware join: key salting for hot join keys.

The reference splits coprocessor work by storage region, so one hot key
lands on one TiKV region server the same way one hot key lands on one Spark
shuffle partition; its mitigation is region-split heuristics.  On Spark the
first line of defense is AQE's runtime skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in our session defaults), which
only rewrites SORT-MERGE joins whose partition files exceed the skew
thresholds.  This module is the explicit fallback for plans AQE won't
rewrite (broadcast-ineligible hash joins, skew below file thresholds but
above wall-clock tolerance, or deliberate pre-partitioned layouts):

- ``salted_join(facts, dims, on, salt)``: replicate the small side ``salt``
  ways (explode over the salt range — rows × salt), scatter the big side's
  hot keys uniformly with a random salt column, and join on
  ``(key, salt)``.  The hot key's rows now spread over ``salt`` partitions
  instead of one.  Correctness is unchanged for inner/left joins on the
  fact side: every fact row still meets exactly the dim rows of its key
  (each dim row exists once per salt bucket).

At 100 TB: salt only what needs salting — pass ``hot_keys`` (e.g. from a
1-in-10k sample aggregation) to split the plan into a salted hot-key branch
and a plain branch union, so the replication cost scales with the hot-key
dim rows, not the whole dim table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    salt: int = 8,
    how: str = "inner",
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on equi-keys ``on``, spreading each of
    ``big``'s keys across ``salt`` shuffle partitions.

    ``how`` must be a fact-side-preserving type (``inner`` or ``left``) —
    replicating the small side would duplicate its unmatched rows under
    right/full joins.  With ``hot_keys`` (a 1-column-per-key DataFrame of
    the skewed key values), only matching rows take the salted path; the
    rest join normally and the two branches union."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if hot_keys is not None:
        big_hot = big.join(F.broadcast(hot_keys), on=on, how="left_semi")
        big_cold = big.join(F.broadcast(hot_keys), on=on, how="left_anti")
        small_hot = small.join(F.broadcast(hot_keys), on=on, how="left_semi")
        small_cold = small.join(F.broadcast(hot_keys), on=on, how="left_anti")
        hot = salted_join(big_hot, small_hot, on, salt=salt, how=how)
        cold = big_cold.join(small_cold, on=on, how=how)
        return hot.unionByName(cold)

    salt_col = "__salt"
    big_salted = big.withColumn(
        salt_col, (F.rand(seed=42) * salt).cast("int")
    )
    small_salted = small.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_salted.join(small_salted, on=[*on, salt_col], how=how).drop(
        salt_col
    )
