"""Structured Streaming surface over the ``events`` fixture.

The reference has no streaming operators (SURVEY.md §2.12) — this layer is
the additive north-star surface, built the idiomatic Spark way: one set of
event-time transformations that run identically on a batch DataFrame and a
``readStream`` DataFrame (Spark's unified model), plus a file-source stream
factory, a memory-sink runner for tests, and a custom stateful operator via
``applyInPandasWithState``.

Scale notes: every aggregation here is keyed by (window, key) so state is
bounded by watermark expiry; the file source scales by listing directories
(100 TB = many files, ``maxFilesPerTrigger`` paces ingestion); the stateful
op keeps O(users) state rows, each O(1).
"""

from __future__ import annotations

import os
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

def _exact_sum():
    """Exact, order-independent sum for the oracle gate: decimal
    accumulation, double presentation (FP sums are fold-order sensitive
    across engines).  Function, not module constant: building a Column
    requires an active SparkContext."""
    return F.sum(F.col("value").cast("decimal(18,2)")).cast("double")


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over the events parquet (same nanos handling as
    the batch catalog; schema comes from a batch peek since streams need an
    explicit schema)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The TIMESTAMP_NTZ -> TIMESTAMP cast below is wall-clock identity only
    # under a UTC session; enforce the invariant where it is relied on rather
    # than trusting the caller's session config.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        # File-source streams list directories; a single-file fixture is
        # addressed as dir + glob.
        sdf = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    else:
        sdf = reader.parquet(path)
    ts_type = dict(sdf.dtypes).get("ts")
    if ts_type == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Watermarks (EventTimeWatermark) require TimestampType; the session
        # runs in UTC so the cast is wall-clock identity.
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return sdf


def with_watermark(df: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Watermark for streaming input; no-op on batch DataFrames (Spark
    ignores watermarks in batch queries)."""
    return df.withWatermark("ts", delay)


def tumbling_agg(df: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows per event_type: count + exact sum."""
    return (
        df.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), _exact_sum().alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    df: DataFrame, width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Sliding (hopping) windows: each event lands in width/slide windows."""
    return (
        df.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), _exact_sum().alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_agg(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (gap-based): a session closes after ``gap``
    of inactivity; window end = last event + gap (Spark session_window
    semantics — the DuckDB oracle mirrors this with lag/cumsum
    sessionization)."""
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), _exact_sum().alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def earliest_per_key(df: DataFrame) -> DataFrame:
    """Keyed dedup to the earliest event per (user_id, event_type) — the
    deterministic batch analog of dropDuplicatesWithinWatermark (which keeps
    an arbitrary first-seen row; we pin min ts / min event_id so batch,
    stream and oracle agree)."""
    return df.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"),
        F.min("event_id").alias("first_event_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


def dedup_within_watermark(df: DataFrame, delay: str = "1 hour") -> DataFrame:
    """True streaming dedup: state-backed dropDuplicatesWithinWatermark on
    (user_id, event_type); state expires past the watermark."""
    return df.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def click_error_interval_join(
    clicks: DataFrame, errors: DataFrame, *, gap: str = "10 minutes"
) -> DataFrame:
    """Stream-stream interval join: per user, each click pairs with errors
    in (click_ts, click_ts + gap].  On streaming inputs both sides must be
    watermarked (state eviction follows the interval bound); identical code
    runs in batch.  Output is keyed (user_id, click_id, error_id)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    e = errors.select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    return c.join(
        e,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("error_ts") > F.col("click_ts"))
        & (F.col("error_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {gap}")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "error_id",
        "error_ts",
    )


def click_error_left_join(
    clicks: DataFrame, errors: DataFrame, *, gap: str = "10 minutes"
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click emits, paired
    with each error in (click_ts, click_ts + gap] or with NULL error
    columns if none arrived.  On streaming inputs both sides must be
    watermarked; the NULL row for an unmatched click is emitted only once
    the watermark passes click_ts + gap (state eviction proves no match
    can still arrive) — so a terminating run emits NULLs for every click
    older than the final watermark, and the identical code in batch mode
    is a plain left join."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    e = errors.select(
        F.col("user_id").alias("e_user"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    return c.join(
        e,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("error_ts") > F.col("click_ts"))
        & (F.col("error_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {gap}")),
        "leftOuter",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "error_id",
        "error_ts",
    )


# ---------------------------------------------------------------------------
# Custom stateful operator (applyInPandasWithState).

_RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("batch_events", LongType()),
        StructField("total_events", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("total", LongType())])


def _running_count(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    total = state.get[0] if state.exists else 0
    batch = 0
    last_ts = None
    for pdf in pdfs:
        batch += len(pdf)
        m = pdf["ts"].max()
        last_ts = m if last_ts is None else max(last_ts, m)
    total += batch
    state.update((total,))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "batch_events": [batch],
            "total_events": [total],
            "last_ts": [last_ts],
        }
    )


def running_user_counts(sdf: DataFrame) -> DataFrame:
    """Per-user running event counter across micro-batches — the custom
    stateful-operator pattern (state = one long per user, emitted once per
    batch per active user)."""
    return sdf.groupBy("user_id").applyInPandasWithState(
        _running_count,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    sdf: DataFrame, name: str, *, output_mode: str = "append"
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink; returns the sink as a batch DataFrame.  Test/dev helper — real
    deployments write to files/Kafka with checkpointing."""
    query = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return sdf.sparkSession.table(name)


def stream_merge_into(
    sdf: DataFrame,
    table,
    *,
    checkpoint_dir: str,
    transform=None,
) -> None:
    """CDC-style streaming upsert: drain ``sdf`` (availableNow) and MERGE
    each micro-batch into a :class:`~tidb_spark.sources.dml.ManagedTable`
    by key — the lakehouse ``foreachBatch`` + MERGE pattern, giving the
    engine's write path (executor/insert.go dup-key semantics) a streaming
    front end.  ``transform`` (batch DataFrame -> batch DataFrame) runs
    per micro-batch before the merge, e.g. reduce-to-latest-per-key.

    Exactly-once-per-restart: the checkpoint tracks consumed source files,
    and MERGE is idempotent for same-key re-delivery — replayed rows
    update in place instead of duplicating (the standard Spark recipe for
    end-to-end idempotent sinks)."""

    def _sink(batch: DataFrame, _epoch: int) -> None:
        if transform is not None:
            batch = transform(batch)
        table.upsert(batch)

    query = (
        sdf.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def cascade_rollup(df: DataFrame) -> DataFrame:
    """Two-tier cascading rollup: minute partials re-aggregated to hours —
    the continuous-materialized-view pattern (store the fine tier, serve
    the coarse tiers from partials instead of raw events).

    Losslessness contract: count and decimal-sum are decomposable
    aggregates, so hour-from-minutes equals hour-from-raw exactly (the
    registered oracle is the direct hour aggregation).  At 100 TB the
    hour tier touches 60× fewer rows than the raw scan, and the second
    stage shuffles minute-partial rows only."""
    minutes = df.groupBy(
        F.window("ts", "1 minute").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
    )
    # Window-of-window keeps the event-time watermark flowing through the
    # second stateful aggregation (Spark's chained-stateful-operators
    # contract) — date_trunc over w.start would sever it and break the
    # streaming form of this exact plan.
    return (
        minutes.groupBy(F.window(F.col("w"), "1 hour").alias("h"), "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_dec").cast("double").alias("sum_value"),
        )
        .select(
            F.col("h.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
