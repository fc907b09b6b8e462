"""Plan cache for PREPARE/EXECUTE (planner/core/plan_cache.go
GetPlanFromPlanCache, re-expressed as a lowered-text cache — the Python
dialect pipeline runs once per (statement, catalog epoch); Catalyst +
AQE still plan every execution) plus the @@last_plan_from_cache
observability var (sessionctx/variable/session.go) and @@sysvar reads.
"""

from __future__ import annotations

import pytest


def _from_cache(engine) -> int:
    return int(
        engine.sql("SELECT @@last_plan_from_cache AS c").collect()[0].c
    )


def test_execute_second_run_hits_cache(engine):
    """First EXECUTE lowers and populates; second binds the cached text.
    Results must be identical and @@last_plan_from_cache must read 0
    then 1 (the reference exposes exactly this var)."""
    engine.sql(
        "PREPARE s FROM 'SELECT n_name, n_regionkey FROM nation "
        "WHERE n_regionkey < ? ORDER BY n_name LIMIT ?'"
    )
    engine.sql("SET @a = 3")
    engine.sql("SET @b = 5")
    r1 = [tuple(r) for r in engine.sql("EXECUTE s USING @a, @b").collect()]
    assert _from_cache(engine) == 0
    r2 = [tuple(r) for r in engine.sql("EXECUTE s USING @a, @b").collect()]
    assert _from_cache(engine) == 1
    assert r1 == r2 and len(r1) == 5
    # Rebinding different parameters still uses the cached lowering.
    engine.sql("SET @a = 1")
    r3 = engine.sql("EXECUTE s USING @a, @b").collect()
    assert _from_cache(engine) == 1
    assert all(r.n_regionkey < 1 for r in r3)


def test_ddl_and_dml_invalidate(engine):
    """Any catalog/data mutation bumps the epoch: the next EXECUTE
    re-lowers (from_cache=0), then caches again — the reference
    invalidates on schema version the same way (plan_cache.go)."""
    engine.sql("PREPARE s FROM 'SELECT COUNT(*) AS n FROM region WHERE r_regionkey < ?'")
    engine.sql("SET @k = 99")
    engine.sql("EXECUTE s USING @k")
    engine.sql("EXECUTE s USING @k")
    assert _from_cache(engine) == 1
    engine.sql("CREATE TABLE plan_cache_tt (x BIGINT)")
    engine.sql("EXECUTE s USING @k")
    assert _from_cache(engine) == 0
    engine.sql("EXECUTE s USING @k")
    assert _from_cache(engine) == 1
    engine.sql("INSERT INTO plan_cache_tt VALUES (1)")
    engine.sql("EXECUTE s USING @k")
    assert _from_cache(engine) == 0
    # SET of a USER variable must NOT invalidate (statements reading
    # @vars are uncacheable, so no cached lowering depends on one).
    engine.sql("EXECUTE s USING @k")
    engine.sql("SET @other = 42")
    engine.sql("EXECUTE s USING @k")
    assert _from_cache(engine) == 1
    # SET of a SYSvar does (sysvars steer lowering).
    engine.sql("SET @@graph_topk_max_hops = 4")
    engine.sql("EXECUTE s USING @k")
    assert _from_cache(engine) == 0


def test_limit_offset_reorder_binds_positionally(engine):
    """MySQL ``LIMIT ?, ?`` lowers to ``LIMIT ? OFFSET ?`` — the rewrite
    REORDERS the placeholders, which is exactly why the cache pins them
    as named :pN markers.  Cached and uncached runs must agree."""
    engine.sql(
        "PREPARE s FROM 'SELECT n_name FROM nation ORDER BY n_name "
        "LIMIT ?, ?'"
    )
    engine.sql("SET @off = 2")
    engine.sql("SET @cnt = 3")
    a = [r.n_name for r in engine.sql("EXECUTE s USING @off, @cnt").collect()]
    b = [r.n_name for r in engine.sql("EXECUTE s USING @off, @cnt").collect()]
    assert _from_cache(engine) == 1
    ref = [
        r.n_name
        for r in engine.sql(
            "SELECT n_name FROM nation ORDER BY n_name LIMIT 2, 3"
        ).collect()
    ]
    assert a == b == ref and len(ref) == 3


def test_skip_reasons_stay_on_slow_path(engine):
    """The reference's skip-plan-cache reasons
    (plan_cacheable_checker.go): fulltext AGAINST (literal-only arg),
    user @variables, DML — each executes correctly every time and never
    reports from_cache=1."""
    engine.sql(
        "PREPARE ft FROM 'SELECT COUNT(*) AS n FROM region "
        "WHERE MATCH(r_name) AGAINST(''ASIA'' IN BOOLEAN MODE)'"
    )
    assert engine.sql("EXECUTE ft").collect()[0].n == 1
    assert engine.sql("EXECUTE ft").collect()[0].n == 1
    assert _from_cache(engine) == 0
    engine.sql("SET @v = 2")
    engine.sql(
        "PREPARE uv FROM 'SELECT COUNT(*) AS n FROM nation "
        "WHERE n_regionkey = @v'"
    )
    engine.sql("EXECUTE uv")
    engine.sql("EXECUTE uv")
    assert _from_cache(engine) == 0
    engine.sql("CREATE TABLE pc_dml (x BIGINT)")
    engine.sql("PREPARE ins FROM 'INSERT INTO pc_dml VALUES (?)'")
    engine.sql("SET @x = 7")
    engine.sql("EXECUTE ins USING @x")
    engine.sql("EXECUTE ins USING @x")
    assert _from_cache(engine) == 0
    assert (
        engine.sql("SELECT COUNT(*) AS n FROM pc_dml").collect()[0].n == 2
    )


def test_capacity_eviction(engine, spark):
    """LRU capacity (default 100, conf
    spark.tidb_spark.plan_cache.size — the reference's
    tidb_session_plan_cache_size): exceeding it evicts the oldest."""
    spark.conf.set("spark.tidb_spark.plan_cache.size", "2")
    try:
        engine.sql("SET @k = 1")
        for i in range(3):
            engine.sql(
                f"PREPARE p{i} FROM 'SELECT {i} AS tag, COUNT(*) AS n "
                "FROM region WHERE r_regionkey < ?'"
            )
            engine.sql(f"EXECUTE p{i} USING @k")
        assert len(engine.plan_cache) == 2
        engine.sql("EXECUTE p0 USING @k")  # evicted -> re-lower
        assert _from_cache(engine) == 0
    finally:
        spark.conf.unset("spark.tidb_spark.plan_cache.size")


def test_sysvar_reads(engine):
    """SELECT @@sysvar (sessionctx/variable): SET-recorded values,
    engine defaults, and MySQL's unknown-variable error."""
    assert (
        engine.sql("SELECT @@version AS v").collect()[0].v
        == "8.0-tidb_spark"
    )
    engine.sql("SET @@my_knob = 42")
    assert engine.sql("SELECT @@my_knob AS v").collect()[0].v == 42
    assert (
        engine.sql("SELECT @@SESSION.my_knob AS v").collect()[0].v == 42
    )
    with pytest.raises(ValueError, match="Unknown system variable"):
        engine.sql("SELECT @@no_such_var")
