"""As-of join operator semantics (operators/asof.py) — backward/forward
directions, tolerance nulling, no-match rows, tie handling, and the
one-shuffle plan shape."""

from datetime import datetime

import pytest
from pyspark.sql import Row

from tidb_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, t=_ts("2024-01-01 10:00:00"), lv="a"),
            Row(k=1, t=_ts("2024-01-01 12:00:00"), lv="b"),
            Row(k=2, t=_ts("2024-01-01 09:00:00"), lv="c"),  # no right row
            Row(k=3, t=_ts("2024-01-01 10:00:00"), lv="d"),  # exact tie
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, t=_ts("2024-01-01 09:30:00"), rv=10),
            Row(k=1, t=_ts("2024-01-01 11:00:00"), rv=20),
            Row(k=1, t=_ts("2024-01-01 13:00:00"), rv=30),
            Row(k=3, t=_ts("2024-01-01 10:00:00"), rv=40),
        ]
    )
    return left, right


def test_asof_backward(frames):
    left, right = frames
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t"
    ).collect()
    got = {r.lv: r.rv_r for r in out}
    # a: latest right <= 10:00 is 09:30 (10); b: 11:00 (20);
    # c: no right row for k=2; d: equal time is inclusive (40)
    assert got == {"a": 10, "b": 20, "c": None, "d": 40}
    assert len(out) == 4  # every left row survives


def test_asof_forward(frames):
    left, right = frames
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        direction="forward",
    ).collect()
    got = {r.lv: r.rv_r for r in out}
    # a: earliest right >= 10:00 is 11:00 (20); b: 13:00 (30);
    # d: equal time inclusive (40)
    assert got == {"a": 20, "b": 30, "c": None, "d": 40}


def test_asof_tolerance(frames):
    left, right = frames
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        tolerance_us=10 * 60 * 1_000_000,  # 10 minutes
    ).collect()
    got = {r.lv: r.rv_r for r in out}
    # a's best match (09:30) is 30 min away -> nulled; b's (11:00) is
    # 60 min away -> nulled; d is 0 away -> kept
    assert got == {"a": None, "b": None, "c": None, "d": 40}


def test_asof_bad_direction(frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            left, right, on=["k"], left_time="t", right_time="t",
            direction="sideways",
        )


def test_asof_plan_single_shuffle(spark):
    """The union+window formulation shuffles ONCE on the key — a range
    join would enumerate pairs; pin the shape so a regression to a join
    is caught."""
    from tidb_spark.queries import all_queries

    q = all_queries()["join_asof"]
    df = q.spark(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exchanges: one hashpartitioning(user_id) for the window + the
    # final orderBy's range partitioning — no join operator at all
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
