"""Bucketed tables: co-located, shuffle-free joins.

The reference co-locates work by pushing operators to the storage region
holding the rows (coprocessor model); Spark's equivalent at rest is
bucketing — both join sides pre-hash-partitioned into the same number of
buckets on the join key, so the join reads bucket i against bucket i with
NO exchange.  At 100 TB this converts the biggest shuffle of a fact-fact
join (e.g. orders ⋈ lineitem on orderkey) into a metadata decision.
SURVEY §1.4 also prescribes this for edge tables (bucket by src).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    *,
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.
    Sorting within buckets additionally enables merge-join without a sort
    step."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key — planner emits a
    shuffle-free join (verified in tests/test_plans.py)."""
    return spark.table(left).join(spark.table(right), on=on, how=how)
