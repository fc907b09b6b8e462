"""Structured Streaming layer tests: the SAME transformation run over a
readStream source (availableNow → memory sink) must equal its batch run —
Spark's unified-model contract.  Plus the genuinely stream-only operators:
dropDuplicatesWithinWatermark and the applyInPandasWithState running
counter, exercised across multiple micro-batches.
"""

from __future__ import annotations

import os
import uuid

import pytest

from tidb_spark.catalog import load_table
from tidb_spark.streaming import events as ev
from tests.conftest import TEST_SF_DIR, assert_frames_match


def _sorted_pdf(df, cols):
    return df.orderBy(*cols).toPandas()


def test_stream_tumbling_equals_batch(spark):
    batch = ev.tumbling_agg(load_table(spark, TEST_SF_DIR, "events"))
    stream = ev.tumbling_agg(ev.events_stream(spark, TEST_SF_DIR))
    out = ev.run_to_memory(stream, f"t_{uuid.uuid4().hex}", output_mode="complete")
    assert_frames_match(
        out.toPandas(), batch.toPandas(), "stream_tumbling_vs_batch"
    )


def test_stream_session_equals_batch(spark):
    batch = ev.session_agg(load_table(spark, TEST_SF_DIR, "events"))
    stream = ev.session_agg(
        ev.with_watermark(ev.events_stream(spark, TEST_SF_DIR))
    )
    out = ev.run_to_memory(stream, f"s_{uuid.uuid4().hex}", output_mode="complete")
    assert_frames_match(
        out.toPandas(), batch.toPandas(), "stream_session_vs_batch"
    )


@pytest.fixture(scope="module")
def multi_file_events(spark, tmp_path_factory):
    """events split into 4 parquet files so maxFilesPerTrigger=1 yields 4
    micro-batches (exercises cross-batch state)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    df = load_table(spark, TEST_SF_DIR, "events")
    df.repartition(4).write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    return out


def test_dedup_within_watermark_stream(spark, multi_file_events):
    sdf = ev.events_stream(spark, multi_file_events, max_files_per_trigger=1)
    # Delay wider than the fixture's ~30-day span: no state expiry, so the
    # stream dedup must equal batch-distinct.  (A shorter delay correctly
    # re-emits keys whose state aged out — that's within-watermark
    # semantics, not a bug.)
    deduped = ev.dedup_within_watermark(sdf, "60 days")
    out = ev.run_to_memory(deduped, f"d_{uuid.uuid4().hex}")
    got = out.toPandas()
    keys = load_table(spark, TEST_SF_DIR, "events").select(
        "user_id", "event_type"
    ).distinct()
    # one surviving row per key, keys identical to batch-distinct
    assert len(got) == keys.count()
    assert (
        got[["user_id", "event_type"]].drop_duplicates().shape[0] == len(got)
    )


def test_running_user_counts_stateful(spark, multi_file_events):
    sdf = ev.events_stream(spark, multi_file_events, max_files_per_trigger=1)
    out = ev.run_to_memory(
        ev.running_user_counts(sdf), f"r_{uuid.uuid4().hex}"
    )
    got = out.toPandas()
    # multiple micro-batches → at least one user appears in >1 batch row
    assert got.groupby("user_id").size().max() > 1
    # final totals equal the batch per-user counts
    finals = got.sort_values("total_events").groupby("user_id").last()
    batch_counts = (
        load_table(spark, TEST_SF_DIR, "events")
        .groupBy("user_id")
        .count()
        .toPandas()
        .set_index("user_id")["count"]
    )
    for uid, row in finals.iterrows():
        assert row["total_events"] == batch_counts[uid], uid
    # per-batch increments sum to the total
    sums = got.groupby("user_id")["batch_events"].sum()
    for uid in sums.index:
        assert sums[uid] == batch_counts[uid], uid


def test_stream_stream_interval_join(spark):
    """Stream-stream time-interval join == the identical batch join."""
    from pyspark.sql import functions as F

    batch = load_table(spark, TEST_SF_DIR, "events")
    b = ev.click_error_interval_join(
        batch.where(F.col("event_type") == "click"),
        batch.where(F.col("event_type") == "error"),
    )
    sdf = ev.events_stream(spark, TEST_SF_DIR)
    s = ev.click_error_interval_join(
        sdf.where(F.col("event_type") == "click").withWatermark("ts", "1 hour"),
        sdf.where(F.col("event_type") == "error").withWatermark("ts", "1 hour"),
    )
    out = ev.run_to_memory(s, f"j_{uuid.uuid4().hex}")
    assert_frames_match(out.toPandas(), b.toPandas(), "stream_interval_join")


def test_stream_merge_into_managed_table(spark, tmp_path):
    """Streaming upsert sink: drain the events stream into a managed table
    via per-batch MERGE; replaying the same source into the same table
    updates in place (idempotent re-delivery) instead of duplicating."""
    from pyspark.sql import functions as F

    from tidb_spark.sources.dml import ManagedTable
    from tidb_spark.streaming.events import events_stream, stream_merge_into

    batch = load_table(spark, TEST_SF_DIR, "events")
    n_events = batch.count()
    empty = batch.where(F.lit(False)).select(
        "event_id", "user_id", "event_type", "value"
    )
    table = ManagedTable(
        spark, str(tmp_path / "evt"), key_cols=["event_id"], df=empty
    )

    def project(b):
        return b.select("event_id", "user_id", "event_type", "value")

    sdf = events_stream(spark, TEST_SF_DIR, max_files_per_trigger=1)
    stream_merge_into(
        sdf, table, checkpoint_dir=str(tmp_path / "ck1"), transform=project
    )
    assert table.df().count() == n_events

    # replay with a FRESH checkpoint: every key re-delivered -> update path,
    # no duplicates
    sdf2 = events_stream(spark, TEST_SF_DIR)
    stream_merge_into(
        sdf2, table, checkpoint_dir=str(tmp_path / "ck2"), transform=project
    )
    assert table.df().count() == n_events

    # resuming from the CONSUMED checkpoint delivers nothing new
    sdf3 = events_stream(spark, TEST_SF_DIR)
    stream_merge_into(
        sdf3, table, checkpoint_dir=str(tmp_path / "ck1"), transform=project
    )
    assert table.df().count() == n_events


def test_stream_cascade_rollup_equals_batch_closed_windows(spark):
    """Chained stateful aggregation (minute partials → hour rollup) must
    run as a STREAM (window-of-window watermark propagation) and its
    append-mode output must equal the batch run on every CLOSED window
    (hour_end ≤ final watermark = max_ts − 1h); open windows are
    legitimately withheld by append mode."""
    from pyspark.sql import functions as F

    batch_src = load_table(spark, TEST_SF_DIR, "events")
    batch = ev.cascade_rollup(batch_src)
    max_ts = batch_src.agg(F.max("ts")).first()[0]
    import datetime

    cutoff = max_ts - datetime.timedelta(hours=1)
    closed = batch.where(
        F.col("window_start") + F.expr("interval 1 hour") <= F.lit(cutoff)
    )
    stream = ev.cascade_rollup(
        ev.with_watermark(ev.events_stream(spark, TEST_SF_DIR), "1 hour")
    )
    out = ev.run_to_memory(
        stream, f"c_{uuid.uuid4().hex}", output_mode="append"
    ).where(F.col("window_start") + F.expr("interval 1 hour") <= F.lit(cutoff))
    assert_frames_match(
        _sorted_pdf(out, ["window_start", "event_type"]),
        _sorted_pdf(closed, ["window_start", "event_type"]),
        "stream_cascade_vs_batch",
    )


def test_stream_stream_left_outer_join(spark, tmp_path_factory):
    """Stream-stream LEFT OUTER interval join == the identical batch left
    join.  NULL rows only emit once the watermark proves no match can
    arrive; the watermark is the MIN across both branch watermarks and
    only advances between micro-batches.  The source is therefore staged
    as three batches: (1) all real events; (2) a far-future sentinel
    click + error for a user with no real events — surviving both branch
    filters so BOTH branch watermarks advance; (3) a filtered-out row,
    giving the stateful operator one batch running under the advanced
    watermark to flush every real click's eviction output."""
    import time

    from pyspark.sql import functions as F

    src = str(tmp_path_factory.mktemp("lo_join_src"))
    dest = os.path.join(src, "events.parquet")
    batch = load_table(spark, TEST_SF_DIR, "events")
    batch.coalesce(1).write.mode("overwrite").parquet(dest)
    uid_t = batch.schema["user_id"].dataType

    def _row(event_id, ts, user_id, event_type):
        return batch.limit(1).select(
            F.lit(event_id).cast("long").alias("event_id"),
            F.lit(ts).cast("timestamp").alias("ts"),
            F.lit(user_id).cast(uid_t).alias("user_id"),
            F.lit(event_type).alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )

    time.sleep(1.1)  # FileStreamSource orders by mtime (oldest first)
    # Sentinel click (Mar 2) precedes sentinel error (Mar 1) in event time,
    # so they can never join each other.
    _row(10**9, "2024-03-02 00:00:00", 10**9, "click").unionAll(
        _row(10**9 + 1, "2024-03-01 00:00:00", 10**9, "error")
    ).coalesce(1).write.mode("append").parquet(dest)
    time.sleep(1.1)
    _row(10**9 + 2, "2024-03-03 00:00:00", 10**9, "view").coalesce(1).write.mode(
        "append"
    ).parquet(dest)

    cutoff = "2024-01-28 00:00:00"
    is_sentinel = F.col("user_id") == 10**9
    b = ev.click_error_left_join(
        batch.where(
            (F.col("event_type") == "click") & (F.col("ts") < F.lit(cutoff))
        ),
        batch.where(F.col("event_type") == "error"),
    )
    sdf = ev.events_stream(spark, src, max_files_per_trigger=1)
    s = ev.click_error_left_join(
        sdf.where(
            (F.col("event_type") == "click")
            & ((F.col("ts") < F.lit(cutoff)) | is_sentinel)
        ).withWatermark("ts", "1 hour"),
        sdf.where(F.col("event_type") == "error").withWatermark("ts", "1 hour"),
    )
    out = ev.run_to_memory(s, f"lo_{uuid.uuid4().hex}")
    got = out.where(F.col("user_id") != 10**9)
    assert_frames_match(got.toPandas(), b.toPandas(), "stream_left_outer_join")
