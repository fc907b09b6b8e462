"""Dialect-layer tests: pure-string translator checks (no Spark), engine
execution of MySQL-isms with pinned expected values, and SQL-MATCH vs
DataFrame-builder equivalence.
"""

from __future__ import annotations

import pytest

from tidb_spark.sqlshim.translate import translate
from tests.conftest import TEST_SF_DIR


@pytest.mark.parametrize(
    "src, expected",
    [
        (
            "SELECT a FROM t LIMIT 2, 3",
            "SELECT a FROM t LIMIT 3 OFFSET 2",
        ),
        (
            "SELECT 'LIMIT 1, 2' AS s FROM t LIMIT 1, 2",
            "SELECT 'LIMIT 1, 2' AS s FROM t LIMIT 2 OFFSET 1",
        ),
        ("SELECT a REGEXP 'x' FROM t", "SELECT a RLIKE 'x' FROM t"),
        (
            "SELECT DATE_FORMAT(d, '%Y-%m') FROM t",
            "SELECT date_format(d, 'yyyy-MM') FROM t",
        ),
        (
            "SELECT 'DATE_FORMAT(d, %Y)' FROM t",
            "SELECT 'DATE_FORMAT(d, %Y)' FROM t",
        ),
        (
            "SELECT STR_TO_DATE('2024-03-05', '%Y-%m-%d')",
            "SELECT to_date('2024-03-05', 'yyyy-MM-dd')",
        ),
        (
            "SELECT STR_TO_DATE(s, '%Y-%m-%d %H:%i:%s')",
            "SELECT to_timestamp(s, 'yyyy-MM-dd HH:mm:ss')",
        ),
        (
            "SELECT DATE_ADD(d, INTERVAL 1 DAY)",
            "SELECT (d + INTERVAL 1 DAY)",
        ),
        (
            "SELECT DATE_FORMAT(DATE_ADD(d, INTERVAL 1 DAY), '%Y')",
            "SELECT date_format((d + INTERVAL 1 DAY), 'yyyy')",
        ),
        (
            "SELECT GROUP_CONCAT(x SEPARATOR '|') FROM t",
            "SELECT concat_ws('|', collect_list(x)) FROM t",
        ),
        (
            "SELECT GROUP_CONCAT(DISTINCT x) FROM t",
            "SELECT concat_ws(',', sort_array(collect_set(x), true)) FROM t",
        ),
        (
            "SELECT GROUP_CONCAT(x ORDER BY x DESC) FROM t",
            "SELECT concat_ws(',', sort_array(collect_list(x), false)) FROM t",
        ),
        (
            # ORDER BY key differs from the aggregated expression: must sort
            # by y, not by x (round-1 bug sorted by x silently).
            "SELECT GROUP_CONCAT(name ORDER BY age) FROM t",
            "SELECT concat_ws(',', transform(array_sort(collect_list("
            "struct(age AS _o, name AS _v))), s -> s._v)) FROM t",
        ),
        (
            "SELECT GROUP_CONCAT(name ORDER BY age DESC SEPARATOR '|') FROM t",
            "SELECT concat_ws('|', transform(reverse(array_sort(collect_list("
            "struct(age AS _o, name AS _v)))), s -> s._v)) FROM t",
        ),
        (
            # Double-quoted separator previously mis-parsed into the expr.
            'SELECT GROUP_CONCAT(x SEPARATOR "|") FROM t',
            'SELECT concat_ws("|", collect_list(x)) FROM t',
        ),
        (
            "SELECT JSON_EXTRACT(j, '$.a') FROM t",
            "SELECT get_json_object(j, '$.a') FROM t",
        ),
    ],
)
def test_translate(src, expected):
    assert translate(src) == expected


def test_group_concat_distinct_order_mismatch_rejected():
    with pytest.raises(Exception, match="(?i)distinct"):
        translate("SELECT GROUP_CONCAT(DISTINCT name ORDER BY age) FROM t")


@pytest.fixture(scope="module")
def engine(spark):
    from tidb_spark.engine import Engine

    return Engine(spark, TEST_SF_DIR)


def test_scalar_shims(engine):
    row = engine.sql(
        "SELECT FIELD('b', 'a', 'b', 'c') AS f, CONV('ff', 16, 10) AS c, "
        "INET_ATON('1.2.3.4') AS ia, INET_NTOA(16909060) AS inn, "
        "MAKE_SET(5, 'x', 'y', 'z') AS ms"
    ).collect()[0]
    assert (row.f, row.c, row.ia, row.inn, row.ms) == (
        2,
        "255",
        16909060,
        "1.2.3.4",
        "x,z",
    )


def test_json_mutators(engine):
    row = engine.sql(
        """SELECT JSON_SET('{"a": 1}', '$.b', 2) AS js,
                  JSON_INSERT('{"a": 1}', '$.a', 9) AS ji,
                  JSON_REPLACE('{"a": 1}', '$.a', 9) AS jr,
                  JSON_REMOVE('{"a": 1, "b": 2}', '$.b') AS jd,
                  JSON_MERGE_PATCH('{"a": 1}', '{"b": 2, "a": null}') AS jm,
                  JSON_UNQUOTE('"x"') AS ju,
                  JSON_VALID('[1, 2]') AS jv,
                  JSON_DEPTH('{"a": [1]}') AS jp,
                  JSON_CONTAINS('[1, 2, 3]', '2') AS jc,
                  JSON_OBJECT('a', 1) AS jo,
                  JSON_ARRAY(1, 2) AS ja"""
    ).collect()[0]
    assert row.js == '{"a":1,"b":2}'
    assert row.ji == '{"a":1}'
    assert row.jr == '{"a":9}'
    assert row.jd == '{"a":1}'
    assert row.jm == '{"b":2}'
    assert row.ju == "x"
    assert row.jv is True
    assert row.jp == 3
    assert row.jc is True
    assert row.jo == '{"a":1}'
    assert row.ja == "[1,2]"


def test_match_sql_equals_builder(engine, spark):
    from tidb_spark.graph.match import match

    via_sql = engine.sql(
        "SELECT COUNT(*) AS n FROM MATCH (v_customer AS a)"
        ".OUT(e_knows).(v_customer AS b)"
    ).collect()[0].n
    via_df = (
        match(engine.graph)
        .source("v_customer", "a")
        .out("e_knows")
        .vertex("v_customer", "b")
        .df()
        .count()
    )
    assert via_sql == via_df


def test_match_sql_both_and_multihop(engine):
    n_both = engine.sql(
        "SELECT COUNT(*) AS n FROM MATCH (v_customer AS a)"
        ".BOTH(e_knows).(v_customer AS b)"
    ).collect()[0].n
    n_two_hop = engine.sql(
        "SELECT COUNT(*) AS n FROM MATCH (v_customer AS a)"
        ".OUT(e_knows).OUT(e_knows)"
    ).collect()[0].n
    assert n_both > 0 and n_two_hop > 0


def test_match_any_shortest_sql(engine):
    rows = engine.sql(
        "SELECT src.c_custkey AS s, path, dist, dst.c_custkey AS d "
        "FROM MATCH ANY SHORTEST (v_customer AS src WHERE src.c_custkey <= 1)"
        ".OUT(e_knows).(v_customer AS dst WHERE dst.c_custkey IN (5, 6)) "
        "ORDER BY s, d"
    ).collect()
    assert len(rows) == 4  # 2 sources × 2 destinations
    for r in rows:
        if r.dist >= 0:
            assert r.path.startswith(f"[{r.s},") or r.path == f"[{r.s}]"
            assert r.path.endswith(f",{r.d}]")
        else:
            assert r.path == "Unreachable"


def test_parameterized_sql(engine):
    named = engine.sql(
        "SELECT COUNT(*) AS n FROM customer WHERE c_custkey < :k", {"k": 10}
    ).collect()[0].n
    positional = engine.sql(
        "SELECT COUNT(*) AS n FROM customer WHERE c_custkey < ?", [10]
    ).collect()[0].n
    plain = engine.sql(
        "SELECT COUNT(*) AS n FROM customer WHERE c_custkey < 10"
    ).collect()[0].n
    assert named == positional == plain


def test_sql_dml_lifecycle(engine, spark):
    from tidb_spark.catalog import load_table

    nation = load_table(spark, TEST_SF_DIR, "nation")
    engine.create_table("nation_w", nation, key_cols=["n_nationkey"])
    n0 = nation.count()

    engine.sql("INSERT INTO nation_w VALUES (1000, 'NEWLAND', 9)")
    assert engine.sql("SELECT COUNT(*) AS n FROM nation_w").collect()[0].n == n0 + 1

    engine.sql("REPLACE INTO nation_w VALUES (1000, 'REPLACED', 8)")
    row = engine.sql(
        "SELECT n_name, n_regionkey FROM nation_w WHERE n_nationkey = 1000"
    ).collect()[0]
    assert (row.n_name, row.n_regionkey) == ("REPLACED", 8)

    engine.sql(
        "UPDATE nation_w SET n_name = CONCAT(n_name, '_X') WHERE n_nationkey = 1000"
    )
    assert engine.sql(
        "SELECT n_name FROM nation_w WHERE n_nationkey = 1000"
    ).collect()[0].n_name == "REPLACED_X"

    engine.sql("DELETE FROM nation_w WHERE n_nationkey >= 1000")
    assert engine.sql("SELECT COUNT(*) AS n FROM nation_w").collect()[0].n == n0

    # column-list insert: unnamed columns become NULL
    engine.sql("INSERT INTO nation_w (n_nationkey, n_name) VALUES (2000, 'PARTIAL')")
    row = engine.sql(
        "SELECT n_regionkey FROM nation_w WHERE n_nationkey = 2000"
    ).collect()[0]
    assert row.n_regionkey is None

    # read-only base tables refuse DML
    with pytest.raises(Exception, match="not writable"):
        engine.sql("DELETE FROM nation WHERE n_nationkey = 1")


def test_show_create_table(engine):
    ddl = engine.show_create_table("e_knows")
    assert "SOURCE KEY REFERENCES v_customer" in ddl
    assert "DESTINATION KEY REFERENCES v_customer" in ddl
    vddl = engine.show_create_table("v_customer")
    assert "PRIMARY KEY" in vddl


def test_unsupported_path_types(engine):
    # Bare ALL / ANY walk enumeration errors like the reference planner
    # (ALL SHORTEST / TOP k are supported extensions — see
    # test_match_all_shortest_and_top_k_sql).
    with pytest.raises(ValueError, match="unsupported path pattern"):
        engine.sql(
            "SELECT 1 FROM MATCH ALL (v_customer AS a)"
            ".OUT(e_knows).(v_customer AS b)"
        )
    # Comma multi-path is SUPPORTED since r5 (buildGraph union lowering) —
    # two zero-hop paths union to 2×|customer| rows.
    n = engine.sql(
        "SELECT 1 AS one FROM MATCH (v_customer AS a), (v_customer AS b)"
    ).count()
    assert n > 0 and n % 2 == 0


def test_encryption_functions(engine):
    """builtin_encryption.go parity: AES round-trip (Spark native),
    SHA1/CRC32 (native), COMPRESS/UNCOMPRESS (MySQL 4-byte-prefix zlib
    shims)."""
    row = engine.sql(
        "SELECT CAST(aes_decrypt(aes_encrypt('secret', '0123456789abcdef'), "
        "'0123456789abcdef') AS STRING) AS aes_rt, "
        "sha1('abc') AS s1, crc32('abc') AS c32, "
        "UNCOMPRESS(COMPRESS('hello world hello world')) AS comp_rt, "
        "UNCOMPRESS(COMPRESS('')) AS comp_empty"
    ).collect()[0]
    assert row.aes_rt == "secret"
    assert row.s1 == "a9993e364706816aba3e25717850c26c9cd0d89d"
    assert row.c32 == 891568578
    assert row.comp_rt == "hello world hello world"
    assert row.comp_empty == ""


def test_drop_truncate_flashback(spark, tmp_path):
    """DROP / TRUNCATE / FLASHBACK TABLE lifecycle (parser/ast/ddl.go:3859
    FlashBackTableStmt: restore a dropped or truncated table)."""
    import pytest
    from pyspark.sql import functions as F

    from tidb_spark.catalog import load_table
    from tidb_spark.engine import Engine
    from tests.conftest import TEST_SF_DIR

    eng = Engine(spark, TEST_SF_DIR, workspace=str(tmp_path / "ws"))
    nation = load_table(spark, TEST_SF_DIR, "nation")
    eng.create_table("fb", nation, key_cols=["n_nationkey"])
    n0 = nation.count()

    # TRUNCATE → empty; FLASHBACK → restored
    eng.sql("TRUNCATE TABLE fb")
    assert eng.sql("SELECT COUNT(*) AS n FROM fb").collect()[0].n == 0
    eng.sql("FLASHBACK TABLE fb")
    assert eng.sql("SELECT COUNT(*) AS n FROM fb").collect()[0].n == n0

    # DROP → unqueryable; FLASHBACK TO new name → data back under new name
    eng.sql("DROP TABLE fb")
    assert "fb" not in eng.show_tables()
    with pytest.raises(Exception):
        eng.sql("SELECT COUNT(*) FROM fb").collect()
    eng.sql("FLASHBACK TABLE fb TO fb2")
    assert eng.sql("SELECT COUNT(*) AS n FROM fb2").collect()[0].n == n0
    # DML still works on the recovered table
    eng.sql("DELETE FROM fb2 WHERE n_regionkey = 0")
    left = nation.where(F.col("n_regionkey") != 0).count()
    assert eng.sql("SELECT COUNT(*) AS n FROM fb2").collect()[0].n == left

    # FLASHBACK on a healthy table errors like the reference
    with pytest.raises(ValueError, match="neither dropped nor truncated"):
        eng.sql("FLASHBACK TABLE fb2")


def test_explain_analyze(spark, tmp_path):
    """EXPLAIN ANALYZE returns the post-AQE FINAL plan plus row count."""
    from tidb_spark.engine import Engine
    from tests.conftest import TEST_SF_DIR

    eng = Engine(spark, TEST_SF_DIR, workspace=str(tmp_path / "ws"))
    out = eng.explain_analyze(
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus"
    )
    assert out.startswith("-- rows: ")
    assert int(out.splitlines()[0].split(":")[1]) > 0
    assert "AdaptiveSparkPlan" in out and "isFinalPlan=true" in out


def test_set_user_and_system_variables(spark, tmp_path):
    """SET @var = expr / @@sysvar (executor/set.go:41-96): user variables
    evaluate eagerly and substitute into later statements; unset vars read
    as NULL; spark-prefixed sysvars reach the live conf."""
    from tidb_spark.engine import Engine
    from tests.conftest import TEST_SF_DIR

    eng = Engine(spark, TEST_SF_DIR, workspace=str(tmp_path / "ws"))
    eng.sql("SET @cutoff = 10")
    eng.sql("SET @seg := UPPER('buil' || 'ding')")
    n = eng.sql(
        "SELECT COUNT(*) AS n FROM customer "
        "WHERE c_custkey < @cutoff AND c_mktsegment = @seg"
    ).collect()[0].n
    expected = eng.sql(
        "SELECT COUNT(*) AS n FROM customer "
        "WHERE c_custkey < 10 AND c_mktsegment = 'BUILDING'"
    ).collect()[0].n
    assert n == expected and expected > 0
    # variable referencing another variable
    eng.sql("SET @cutoff2 = @cutoff * 2")
    assert eng.sql("SELECT @cutoff2 AS v").collect()[0].v == 20
    # string with a literal @ is untouched; unset var reads as NULL
    row = eng.sql("SELECT 'a@b' AS s, @nope AS missing").collect()[0]
    assert row.s == "a@b" and row.missing is None
    # sysvar: recorded, spark.* names hit the conf
    eng.sql("SET @@max_execution_time = 1000")
    assert eng.sys_vars["max_execution_time"] == "1000"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    eng.sql("SET @@spark_sql_shuffle_partitions = '16'")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "16"
    spark.conf.set("spark.sql.shuffle.partitions", old)


def test_admin_checksum_table(spark, tmp_path):
    """ADMIN CHECKSUM TABLE (executor/checksum.go): deterministic,
    order-independent digest — unchanged under reshuffle, changed by data."""
    from pyspark.sql import functions as F

    from tidb_spark.catalog import load_table
    from tidb_spark.engine import Engine
    from tests.conftest import TEST_SF_DIR

    eng = Engine(spark, TEST_SF_DIR, workspace=str(tmp_path / "ws"))
    a = eng.sql("ADMIN CHECKSUM TABLE nation").collect()[0]
    assert a.total_kvs == load_table(spark, TEST_SF_DIR, "nation").count()
    b = eng.sql("ADMIN CHECKSUM TABLE nation").collect()[0]
    assert (a.checksum, a.total_kvs, a.total_bytes) == (
        b.checksum,
        b.total_kvs,
        b.total_bytes,
    )
    # same rows, different physical order -> same digest
    nation = load_table(spark, TEST_SF_DIR, "nation")
    eng.create_table("nat_shuffled", nation.repartition(7), ["n_nationkey"])
    c = eng.sql("ADMIN CHECKSUM TABLE nat_shuffled").collect()[0]
    assert c.checksum == a.checksum and c.total_kvs == a.total_kvs
    # a data change moves the digest
    eng.sql("UPDATE nat_shuffled SET n_name = 'X' WHERE n_nationkey = 0")
    d = eng.sql("ADMIN CHECKSUM TABLE nat_shuffled").collect()[0]
    assert d.checksum != a.checksum


def test_match_all_shortest_and_top_k_sql(engine):
    """ALL SHORTEST / TOP k MATCH paths (extensions — the reference's
    planner rejects both, logical_plan_builder.go:6567-6577): ALL emits one
    row per shortest path; TOP k emits up to k ranked simple paths and
    drops unreachable pairs."""
    all_rows = engine.sql(
        "SELECT src.c_custkey AS s, path, dist, dst.c_custkey AS d "
        "FROM MATCH ALL SHORTEST (v_customer AS src WHERE src.c_custkey <= 1)"
        ".OUT(e_knows).(v_customer AS dst WHERE dst.c_custkey IN (5, 6)) "
        "ORDER BY s, d, path"
    ).collect()
    any_rows = engine.sql(
        "SELECT src.c_custkey AS s, path, dist, dst.c_custkey AS d "
        "FROM MATCH ANY SHORTEST (v_customer AS src WHERE src.c_custkey <= 1)"
        ".OUT(e_knows).(v_customer AS dst WHERE dst.c_custkey IN (5, 6)) "
        "ORDER BY s, d, path"
    ).collect()
    # ALL ⊇ ANY: the canonical path appears among all shortest; per-pair
    # dists agree, and every ALL row of a pair has the same dist.
    assert len(all_rows) >= len(any_rows)
    any_by_pair = {(r.s, r.d): r for r in any_rows}
    all_paths_by_pair: dict = {}
    for r in all_rows:
        all_paths_by_pair.setdefault((r.s, r.d), []).append(r)
    assert set(all_paths_by_pair) == set(any_by_pair)
    for pair, rows in all_paths_by_pair.items():
        assert {r.dist for r in rows} == {any_by_pair[pair].dist}
        assert any_by_pair[pair].path in {r.path for r in rows}
        assert len({r.path for r in rows}) == len(rows)  # no dup paths

    top = engine.sql(
        "SELECT src.c_custkey AS s, path, dist, rank, dst.c_custkey AS d "
        "FROM MATCH TOP 2 (v_customer AS src WHERE src.c_custkey <= 1)"
        ".OUT(e_knows).(v_customer AS dst WHERE dst.c_custkey IN (5, 6)) "
        "ORDER BY s, d, rank"
    ).collect()
    by_pair: dict = {}
    for r in top:
        by_pair.setdefault((r.s, r.d), []).append(r)
    for pair, rows in by_pair.items():
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 2
        # rank 1 is the canonical shortest path when the pair is reachable
        if pair in any_by_pair and any_by_pair[pair].dist >= 0:
            assert rows[0].path == any_by_pair[pair].path
            assert rows[0].dist == any_by_pair[pair].dist
        # ranked by (dist, path-as-array) — numeric element order, not
        # string order
        def _arr(p):
            return [int(x) for x in p.strip("[]").split(",")]

        assert rows == sorted(rows, key=lambda r: (r.dist, _arr(r.path)))
    # unreachable pairs are absent from TOP k, present as Unreachable in ANY
    unreachable = {p for p, r in any_by_pair.items() if r.dist < 0}
    assert unreachable.isdisjoint(by_pair)

    # bare ALL / ANY walks still error like the reference planner
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported path pattern"):
        engine.sql("SELECT 1 FROM MATCH ALL (v_customer).OUT(e_knows)")


def test_top_k_beam_matches_exact_on_sparse_graph(spark):
    """The beam-pruned TOP k (scale path) agrees with exact enumeration
    when the beam admits every prefix — pinned on the e_knows graph with a
    generous beam."""
    from pyspark.sql import functions as F

    from tidb_spark.graph.model import default_graph
    from tidb_spark.graph.shortest import top_k_shortest
    from tests.conftest import TEST_SF_DIR

    g = default_graph(spark, TEST_SF_DIR)
    customer = g.vertex("v_customer").df
    sources = customer.where(F.col("c_custkey") < 2).select(
        F.col("c_custkey").alias("root")
    )
    dsts = customer.where(F.col("c_custkey").between(5, 8)).select(
        F.col("c_custkey").alias("dst_id")
    )
    exact = top_k_shortest(
        sources, dsts, g.edge("e_knows"), k=2, max_hops=3
    ).collect()
    beam = top_k_shortest(
        sources, dsts, g.edge("e_knows"), k=2, max_hops=3, beam=8
    ).collect()
    key = lambda r: (r.src_id, r.dst_id, r.rank)  # noqa: E731
    assert sorted(map(tuple, exact)) == sorted(map(tuple, beam))
    assert len(exact) > 0


def test_show_statements(engine):
    """SHOW TABLES/DATABASES/COLUMNS/VARIABLES/CREATE TABLE through the SQL
    surface (executor/show.go, infoschema_reader.go)."""
    tabs = [r[0] for r in engine.sql("SHOW TABLES").collect()]
    assert "nation" in tabs and "orders" in tabs

    dbs = [r.Database for r in engine.sql("SHOW DATABASES").collect()]
    assert "tidb_spark" in dbs and "INFORMATION_SCHEMA" in dbs

    cols = engine.sql("SHOW COLUMNS FROM nation").collect()
    assert [c.Field for c in cols][:2] == ["n_nationkey", "n_name"]
    assert all(
        c.asDict().keys()
        == {"Field", "Type", "Null", "Key", "Default", "Extra"}
        for c in cols
    )
    # DESC is an alias; edge tables expose the synthesized (src,dst) PRI
    desc = engine.sql("DESC e_knows").collect()
    pri = {c.Field for c in desc if c.Key == "PRI"}
    assert pri == {"src", "dst"}

    engine.sql("SET @@graph_topk_beam = 7")
    vrows = {
        r.Variable_name: r.Value
        for r in engine.sql("SHOW VARIABLES").collect()
    }
    assert vrows["graph_topk_beam"] == "7"
    assert "default_week_format" in vrows
    like = engine.sql("SHOW VARIABLES LIKE 'graph%'").collect()
    assert {r.Variable_name for r in like} == {"graph_topk_beam"}

    ct = engine.sql("SHOW CREATE TABLE e_knows").collect()[0]
    assert ct.Table == "e_knows"
    assert "SOURCE KEY REFERENCES" in ct[1]

    # PROCESSLIST gained support in round 4; TRIGGERS remains out of scope.
    with pytest.raises(ValueError, match="unsupported SHOW"):
        engine.sql("SHOW TRIGGERS")


def test_builtin_longtail_point_values(engine):
    """Pin MySQL-documented values for the newly-lowered builtins
    (builtin_time.go / builtin_string.go doc examples)."""
    row = engine.sql(
        "SELECT TO_DAYS('2007-10-07') AS a, "
        "SEC_TO_TIME(2378) AS b, "
        "TIME_TO_SEC('22:23:00') AS c, "
        "PERIOD_DIFF(200802, 200703) AS d, "
        "WEEK('2008-02-20') AS e, "
        "YEARWEEK('1987-01-01') AS f, "
        "ORD('2') AS g, "
        "CHAR(77, 121, 83, 81, 76) AS h, "
        "INSERT('Quadratic', 3, 4, 'What') AS i, "
        "FORMAT(12332.1234, 2) AS j, "
        "QUOTE(NULL) AS k, "
        "INTERVAL(23, 1, 15, 17, 30, 44, 200) AS l, "
        "TRUNCATE(-1.999, 1) AS m, "
        "JSON_TYPE('[1,2]') AS n, "
        "IS_IPV4('10.0.5.256') AS o, "
        "CAST(INET6_NTOA(INET6_ATON('::ffff:1.2.3.4')) AS STRING) AS p, "
        "TIMESTAMPADD(MINUTE, 1, TIMESTAMP'2003-01-02 00:00:00') AS q"
    ).collect()[0]
    assert row.a == 733321
    assert row.b == "00:39:38"
    assert row.c == 80580
    assert row.d == 11
    assert row.e == 7
    assert row.f == 198652
    assert row.g == 50
    assert row.h == "MySQL"
    assert row.i == "QuWhattic"
    assert row.j == "12,332.12"
    assert row.k == "NULL"
    assert row.l == 3
    assert row.m == -1.9
    assert row.n == "ARRAY"
    assert row.o == 0
    assert row.p == "::ffff:102:304" or row.p == "::ffff:1.2.3.4"
    assert str(row.q) == "2003-01-02 00:01:00"


def test_view_lifecycle(engine):
    """CREATE/DROP VIEW (planner/core/planbuilder.go:411,498 buildCreateView;
    executor/ddl.go): lazy expansion into consumers, OR REPLACE, column-list
    rename + arity check, SHOW surface round-trip, and reference-shaped
    errors for duplicate create / dropping non-views."""
    import pytest as _pytest

    engine.sql(
        "CREATE VIEW v_top AS SELECT n_regionkey, COUNT(*) AS n "
        "FROM nation GROUP BY n_regionkey"
    )
    rows = engine.sql("SELECT * FROM v_top ORDER BY n_regionkey").collect()
    assert len(rows) == 5 and all(r.n == 5 for r in rows)
    tabs = {r[0] for r in engine.sql("SHOW TABLES").collect()}
    assert "v_top" in tabs
    txt = engine.sql("SHOW CREATE VIEW v_top").collect()[0][1]
    assert txt.startswith("CREATE VIEW `v_top` AS SELECT")
    assert engine.sql("SHOW CREATE TABLE v_top").collect()[0][1] == txt

    with _pytest.raises(ValueError, match="already exists"):
        engine.sql("CREATE VIEW v_top AS SELECT 1 AS x")
    engine.sql(
        "CREATE OR REPLACE VIEW v_top (rk, cnt) AS "
        "SELECT n_regionkey, COUNT(*) FROM nation GROUP BY n_regionkey"
    )
    assert engine.sql("SELECT cnt FROM v_top WHERE rk = 0").collect()[0].cnt == 5
    with _pytest.raises(ValueError, match="column list"):
        engine.sql("CREATE OR REPLACE VIEW v_bad (a) AS SELECT 1 AS x, 2 AS y")

    # MySQL-dialect view bodies run through the translator.
    engine.sql(
        "CREATE VIEW v_fmt AS SELECT o_orderkey, "
        "DATE_FORMAT(o_orderdate, '%Y') AS y FROM orders WHERE o_orderkey < 8"
    )
    ys = {r.y for r in engine.sql("SELECT y FROM v_fmt").collect()}
    assert ys and all(len(y) == 4 and y.isdigit() for y in ys)

    engine.sql("DROP VIEW v_fmt")
    engine.sql("DROP VIEW v_top")
    with _pytest.raises(ValueError, match="not a known view"):
        engine.sql("DROP VIEW v_top")
    engine.sql("DROP VIEW IF EXISTS v_top")  # no error
    with _pytest.raises(ValueError, match="not a known view"):
        engine.sql("DROP VIEW nation")  # base tables are not droppable views


def test_hint_recognition_and_join_method(engine):
    """/*+ ... */ hints (util/hint/, planner/optimize.go): every TiDB hint
    is recognized and stripped (never mis-lexed into the translator), and
    join-method hints with a Spark analogue are honored via Spark's own
    hint channel."""
    base = (
        "SELECT {h}n_name, r_name FROM nation n "
        "JOIN region r ON n.n_regionkey = r.r_regionkey WHERE n_nationkey < 5 "
        "ORDER BY n_name"
    )
    plain = engine.sql(base.format(h="")).collect()

    # Unknown / inapplicable hints strip cleanly and change nothing.
    noisy = engine.sql(
        base.format(
            h="/*+ LEADING(r, n), MEMORY_QUOTA(1024 MB), USE_INDEX(n, idx), "
            "READ_FROM_STORAGE(TIFLASH[n]) */ "
        )
    ).collect()
    assert noisy == plain

    # SHUFFLE_HASH-mapped hint flips the join away from broadcast.
    hj = engine.sql(base.format(h="/*+ HASH_JOIN(r) */ "))
    assert hj.collect() == plain
    hj_plan = hj._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in hj_plan, hj_plan

    # Broadcast-mapped hint (incl. the INL_JOIN family) keeps broadcast.
    bj = engine.sql(base.format(h="/*+ INL_JOIN(r) */ "))
    assert bj.collect() == plain
    bj_plan = bj._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bj_plan, bj_plan

    # Query-block-qualified args (@sel_1) drop the qualifier token only.
    qb = engine.sql(base.format(h="/*+ MERGE_JOIN(@sel_1 r) */ "))
    assert qb.collect() == plain


def test_describe_view(engine):
    """DESC / SHOW COLUMNS on a view resolves through the catalog like the
    reference's infoschema view handling."""
    engine.sql("CREATE OR REPLACE VIEW v_desc AS SELECT n_nationkey AS k, n_name FROM nation")
    rows = engine.sql("DESC v_desc").collect()
    assert [r.Field for r in rows] == ["k", "n_name"]


def test_view_reflects_dml(engine):
    """Views must track base-table DML (MySQL views expand per statement,
    planbuilder.go buildDataSource): rows inserted after CREATE VIEW are
    visible, and the view survives version pruning (> retain_versions
    writes) instead of dangling on a deleted parquet dir."""
    engine.sql("CREATE TABLE vsrc (id BIGINT PRIMARY KEY, v INT)")
    engine.sql("INSERT INTO vsrc VALUES (1, 10)")
    engine.sql("CREATE VIEW v_live AS SELECT SUM(v) AS total FROM vsrc")
    assert engine.sql("SELECT total FROM v_live").collect()[0].total == 10
    engine.sql("INSERT INTO vsrc VALUES (2, 32)")
    assert engine.sql("SELECT total FROM v_live").collect()[0].total == 42
    # Column-list rename survives the rebuild too.
    engine.sql("CREATE VIEW v_named (t) AS SELECT SUM(v) FROM vsrc")
    assert engine.sql("SELECT t FROM v_named").collect()[0].t == 42
    # Push past retain_versions (8): the old frozen plan's files are pruned;
    # a stale view would throw file-not-found here.
    for i in range(3, 13):
        engine.sql(f"INSERT INTO vsrc VALUES ({i}, 1)")
    assert engine.sql("SELECT total FROM v_live").collect()[0].total == 52
    engine.sql("DROP VIEW v_live")
    engine.sql("DROP VIEW v_named")
    engine.sql("DROP TABLE vsrc")


def test_create_or_replace_view_rejects_tables(engine):
    """OR REPLACE may only replace a VIEW — MySQL ErrWrongObject when the
    name is a base or managed table (executor/ddl.go)."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="is not a VIEW"):
        engine.sql("CREATE OR REPLACE VIEW nation AS SELECT 1 AS x")
    engine.sql("CREATE TABLE orv (id BIGINT PRIMARY KEY)")
    with _pytest.raises(ValueError, match="is not a VIEW"):
        engine.sql("CREATE OR REPLACE VIEW orv AS SELECT 1 AS x")
    engine.sql("DROP TABLE orv")


def test_hint_lands_on_top_level_select(engine):
    """A join-method hint inside a WITH query must attach to the outer
    (top-level) SELECT — anchored via paren/string-aware scanning, not the
    textually-first SELECT (which belongs to the CTE body and would make
    Catalyst silently drop the hint)."""
    q = (
        "WITH big AS (SELECT n_nationkey, n_name, n_regionkey FROM nation) "
        "SELECT {h}n_name, r_name FROM big "
        "JOIN region r ON big.n_regionkey = r.r_regionkey "
        "WHERE n_nationkey < 5 ORDER BY n_name"
    )
    plain = engine.sql(q.format(h="")).collect()
    hj = engine.sql(q.format(h="/*+ HASH_JOIN(r) */ "))
    assert hj.collect() == plain
    plan = hj._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan
    # A string literal containing 'select' must not attract the hint.
    s = engine.sql(
        "SELECT /*+ MERGE_JOIN(r) */ 'select me' AS tag, r_name "
        "FROM region r ORDER BY r_name LIMIT 1"
    ).collect()
    assert s[0].tag == "select me"


def test_prepare_execute_deallocate(engine):
    """PREPARE / EXECUTE USING / DEALLOCATE (executor/prepared.go:1,
    planner/core/common_plans.go Execute rebind): ? placeholders bind
    positionally from user variables, string-literal ?s are untouched,
    re-EXECUTE rebinds, and reference-shaped errors for unknown handlers /
    wrong arity."""
    import pytest as _pytest

    engine.sql("PREPARE get_nation FROM 'SELECT n_name FROM nation "
               "WHERE n_nationkey = ?'")
    engine.sql("SET @k = 3")
    r = engine.sql("EXECUTE get_nation USING @k").collect()
    assert len(r) == 1
    engine.sql("SET @k = 4")
    r2 = engine.sql("EXECUTE get_nation USING @k").collect()
    assert len(r2) == 1 and r2[0].n_name != r[0].n_name
    # PREPARE FROM @var; '?' inside a string literal is not a parameter.
    engine.sql("SET @src = 'SELECT CONCAT(n_name, ''?'') AS q FROM nation "
               "WHERE n_nationkey < ?'")
    engine.sql("PREPARE p2 FROM @src")
    rows = engine.sql("EXECUTE p2 USING @k").collect()
    assert len(rows) == 4 and all(row.q.endswith("?") for row in rows)
    with _pytest.raises(ValueError, match="Incorrect arguments"):
        engine.sql("EXECUTE p2")
    with _pytest.raises(ValueError, match="Unknown prepared statement"):
        engine.sql("EXECUTE nope USING @k")
    engine.sql("DEALLOCATE PREPARE p2")
    with _pytest.raises(ValueError, match="Unknown prepared statement"):
        engine.sql("EXECUTE p2 USING @k")
    engine.sql("DROP PREPARE get_nation")  # DROP synonym
    with _pytest.raises(ValueError, match="not set"):
        engine.sql("PREPARE p3 FROM @unset_var")


def test_sequence_lifecycle(engine):
    """CREATE SEQUENCE + NEXTVAL/LASTVAL/SETVAL (ddl/sequence.go; builtins
    at the end of expression/builtin.go's registry): engine-side counter
    like AUTO_INCREMENT, SHOW CREATE SEQUENCE round-trip, cycle and
    run-out semantics."""
    import pytest as _pytest

    engine.sql("CREATE SEQUENCE sq START WITH 5 INCREMENT BY 2")
    assert engine.sql("SELECT LASTVAL(sq) AS v").collect()[0].v is None
    assert engine.sql("SELECT NEXTVAL(sq) AS v").collect()[0].v == 5
    assert engine.sql("SELECT NEXTVAL(sq) AS v").collect()[0].v == 7
    assert engine.sql("SELECT LASTVAL(sq) AS v").collect()[0].v == 7
    # SETVAL: next allocation continues past the set point.
    assert engine.sql("SELECT SETVAL(sq, 100) AS v").collect()[0].v == 100
    assert engine.sql("SELECT NEXTVAL(sq) AS v").collect()[0].v == 102
    # Multi-row INSERT: each NEXTVAL occurrence allocates.
    engine.sql("CREATE TABLE sq_t (id BIGINT PRIMARY KEY, tag VARCHAR(5))")
    engine.sql("INSERT INTO sq_t VALUES (NEXTVAL(sq), 'a'), (NEXTVAL(sq), 'b')")
    ids = sorted(r.id for r in engine.sql("SELECT id FROM sq_t").collect())
    assert ids == [104, 106], ids
    # SHOW CREATE SEQUENCE round-trips through a fresh create.
    ddl = engine.sql("SHOW CREATE SEQUENCE sq").collect()[0][1]
    assert "START WITH 5" in ddl and "INCREMENT BY 2" in ddl
    engine.sql("DROP SEQUENCE sq")
    engine.sql(ddl.replace("`sq`", "`sq2`"))
    assert engine.sql("SELECT NEXTVAL(sq2) AS v").collect()[0].v == 5
    # Run-out vs cycle.
    engine.sql("CREATE SEQUENCE tiny START WITH 1 MAXVALUE 2")
    assert [engine.sql("SELECT NEXTVAL(tiny) AS v").collect()[0].v
            for _ in range(2)] == [1, 2]
    with _pytest.raises(ValueError, match="run out"):
        engine.sql("SELECT NEXTVAL(tiny) AS v")
    engine.sql("CREATE SEQUENCE loopy START WITH 1 MAXVALUE 2 CYCLE")
    assert [engine.sql("SELECT NEXTVAL(loopy) AS v").collect()[0].v
            for _ in range(3)] == [1, 2, 1]
    with _pytest.raises(ValueError, match="not a sequence"):
        engine.sql("DROP SEQUENCE nation")
    engine.sql("DROP SEQUENCE IF EXISTS ghost")  # no error
    with _pytest.raises(ValueError, match="Unknown SEQUENCE"):
        engine.sql("SELECT NEXTVAL(ghost) AS v")
    engine.sql("DROP SEQUENCE sq2"); engine.sql("DROP SEQUENCE tiny")
    engine.sql("DROP SEQUENCE loopy"); engine.sql("DROP TABLE sq_t")


def test_show_longtail(engine):
    """SHOW INDEX / SHOW STATUS / SHOW GRANTS (executor/show.go): the
    BI-tool probe surface, MySQL-shaped columns."""
    import pytest as _pytest

    engine.sql("CREATE TABLE idx_t (a BIGINT, b BIGINT, PRIMARY KEY (a, b))")
    rows = engine.sql("SHOW INDEX FROM idx_t").collect()
    assert [(r.Key_name, r.Seq_in_index, r.Column_name) for r in rows] == [
        ("PRIMARY", 1, "a"), ("PRIMARY", 2, "b")
    ]
    assert engine.sql("SHOW INDEX FROM nation").collect() == []
    with _pytest.raises(ValueError, match="unknown table"):
        engine.sql("SHOW INDEX FROM ghost")
    st = {r.Variable_name: r.Value for r in engine.sql("SHOW STATUS").collect()}
    # The module-scoped engine may carry tables from earlier tests; the
    # status row must agree with live state.
    assert int(st["tidb_spark_managed_tables"]) == len(engine.managed) >= 1
    g = engine.sql("SHOW GRANTS").collect()
    assert "GRANT ALL PRIVILEGES" in g[0][0]
    g2 = engine.sql("SHOW GRANTS FOR 'app'@'%'").collect()
    assert "'app'@'%'" in g2[0][0]
    engine.sql("DROP TABLE idx_t")


def test_ci_collation_shim(engine):
    """COLLATE …_ci columns (util/collate/ — utf8mb4_general_ci is MySQL's
    default): '=', LIKE, join-key equality, and ORDER BY are
    case-insensitive via the LOWER() shim; non-_ci columns keep binary
    semantics."""
    engine.sql(
        "CREATE TABLE ci_t (id BIGINT PRIMARY KEY, "
        "tag VARCHAR(10) COLLATE utf8mb4_general_ci, "
        "raw VARCHAR(10))"
    )
    engine.sql(
        "INSERT INTO ci_t VALUES (1, 'Apple', 'Apple'), (2, 'apple', 'apple'), "
        "(3, 'BANANA', 'BANANA'), (4, 'banana', 'banana')"
    )
    # '=' matches across case on the _ci column only.
    assert {r.id for r in engine.sql(
        "SELECT id FROM ci_t WHERE tag = 'APPLE'").collect()} == {1, 2}
    assert {r.id for r in engine.sql(
        "SELECT id FROM ci_t WHERE raw = 'APPLE'").collect()} == set()
    # LIKE and reversed literal-first compare.
    assert {r.id for r in engine.sql(
        "SELECT id FROM ci_t WHERE tag LIKE 'b%'").collect()} == {3, 4}
    assert {r.id for r in engine.sql(
        "SELECT id FROM ci_t WHERE 'Banana' = tag").collect()} == {3, 4}
    # ORDER BY groups case variants together (MySQL _ci sort).
    tags = [r.tag for r in engine.sql(
        "SELECT tag FROM ci_t ORDER BY tag, id").collect()]
    assert [t.lower() for t in tags] == ["apple", "apple", "banana", "banana"]
    # _ci = _ci join-key equality matches across case.
    n = engine.sql(
        "SELECT COUNT(*) AS n FROM ci_t a JOIN ci_t b ON a.tag = b.tag "
        "WHERE a.id < b.id"
    ).collect()[0].n
    assert n == 2  # (1,2) and (3,4)
    engine.sql("DROP TABLE ci_t")


def test_tool_compat_statements(engine):
    """Client/BI-tool session statements (session layer of the reference):
    SET NAMES / SET CHARACTER SET / USE / BEGIN / START TRANSACTION /
    COMMIT / KILL accept as no-ops (autocommit model), ROLLBACK errors
    (its promise cannot be honored), SELECT ... FOR UPDATE / LOCK IN SHARE
    MODE strip the lock suffix, SHOW PROCESSLIST answers."""
    import pytest as _pytest

    for stmt in (
        "SET NAMES utf8mb4",
        "SET NAMES utf8mb4 COLLATE utf8mb4_general_ci",
        "SET CHARACTER SET utf8",
        "USE tidb_spark",
        "BEGIN",
        "START TRANSACTION",
        "COMMIT",
        "KILL QUERY 42",
        "KILL 42",
    ):
        assert engine.sql(stmt).collect() == [] or True  # no error is the test
    with _pytest.raises(ValueError, match="ROLLBACK"):
        engine.sql("ROLLBACK")
    r = engine.sql(
        "SELECT n_name FROM nation WHERE n_nationkey = 1 FOR UPDATE"
    ).collect()
    assert len(r) == 1
    r2 = engine.sql(
        "SELECT n_name FROM nation WHERE n_nationkey = 1 LOCK IN SHARE MODE"
    ).collect()
    assert r2 == r
    r3 = engine.sql(
        "SELECT n_name FROM nation WHERE n_nationkey = 1 FOR UPDATE SKIP LOCKED;"
    ).collect()
    assert r3 == r
    pl = engine.sql("SHOW PROCESSLIST").collect()
    assert len(pl) == 1 and pl[0].User == "root"


def test_ci_collation_shim_edges(engine):
    """Review-hardening for the _ci shim: string literals are never
    rewritten, OVER(ORDER BY …) and subquery ORDER BYs are untouched, the
    rewrite applies only to the statement-final top-level ORDER BY, and
    CREATE TABLE LIKE clones collations independent of the source's
    lifetime."""
    engine.sql(
        "CREATE TABLE ci_e (id BIGINT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE utf8mb4_general_ci, note VARCHAR(40))"
    )
    engine.sql(
        "INSERT INTO ci_e VALUES (1, 'Ann', 'name = name'), (2, 'bob', 'x')"
    )
    # Literal containing a ci-column comparison must stay byte-identical.
    r = engine.sql(
        "SELECT id FROM ci_e WHERE note = 'name = name'"
    ).collect()
    assert [x.id for x in r] == [1]
    # Window ORDER BY must not attract LOWER(); output case preserved.
    rows = engine.sql(
        "SELECT ROW_NUMBER() OVER (ORDER BY id) AS rn, name FROM ci_e "
        "ORDER BY name"
    ).collect()
    assert [x.name for x in rows] == ["Ann", "bob"]  # ci sort, case kept
    # LIKE clone keeps _ci semantics after the source is dropped.
    engine.sql("CREATE TABLE ci_c LIKE ci_e")
    engine.sql("DROP TABLE ci_e")
    engine.sql("INSERT INTO ci_c VALUES (9, 'ZED', 'x')")
    assert engine.sql(
        "SELECT id FROM ci_c WHERE name = 'zed'"
    ).collect()[0].id == 9
    engine.sql("DROP TABLE ci_c")


def test_multi_update_key_assignment_rejected(engine):
    import pytest as _pytest

    engine.sql("CREATE TABLE mu_t (id BIGINT PRIMARY KEY, v BIGINT)")
    engine.sql("INSERT INTO mu_t VALUES (1, 10)")
    with _pytest.raises(ValueError, match="key column"):
        engine.sql(
            "UPDATE mu_t JOIN region ON mu_t.v = region.r_regionkey "
            "SET mu_t.id = region.r_regionkey"
        )
    engine.sql("DROP TABLE mu_t")


def test_nextval_insert_select_and_values(engine):
    """r12: NEXTVAL in INSERT … SELECT allocates per row (was rejected
    through r11 — the full semantics are pinned by
    test_sequence_insert_select_per_row); multi-row VALUES keeps its
    one-allocation-per-occurrence splicing."""
    engine.sql("CREATE SEQUENCE bulk_seq")
    engine.sql("CREATE TABLE ns_t (id BIGINT PRIMARY KEY, v BIGINT)")
    engine.sql(
        "INSERT INTO ns_t SELECT NEXTVAL(bulk_seq), n_nationkey FROM nation"
    )
    n = engine.sql("SELECT COUNT(*) AS c FROM nation").collect()[0].c
    ids = sorted(r.id for r in engine.sql("SELECT id FROM ns_t").collect())
    assert ids == list(range(1, n + 1))
    # Multi-row VALUES (one occurrence per row) still allocates correctly.
    engine.sql(
        "INSERT INTO ns_t VALUES (NEXTVAL(bulk_seq), 1), (NEXTVAL(bulk_seq), 2)"
    )
    ids = sorted(r.id for r in engine.sql("SELECT id FROM ns_t").collect())
    assert ids == list(range(1, n + 3))
    engine.sql("DROP TABLE ns_t"); engine.sql("DROP SEQUENCE bulk_seq")


def test_ci_collation_is_table_scoped(engine):
    """ADVICE r4 (high): a _ci declaration on one table must not leak onto
    other tables' same-named columns — the rewrite only activates when the
    query references a table declaring that column _ci (the reference
    resolves collation per column binding, expression/collation.go)."""
    engine.sql(
        "CREATE TABLE ci_scope_a (k BIGINT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE utf8mb4_general_ci)"
    )
    engine.sql("CREATE TABLE plain_b (k BIGINT PRIMARY KEY, name VARCHAR(20))")
    engine.sql("INSERT INTO ci_scope_a VALUES (1, 'Apple'), (2, 'apple')")
    engine.sql("INSERT INTO plain_b VALUES (1, 'Apple'), (2, 'apple')")
    # plain_b keeps binary semantics even while ci_scope_a declares name _ci
    assert {
        r.k
        for r in engine.sql(
            "SELECT k FROM plain_b WHERE name = 'APPLE'"
        ).collect()
    } == set()
    assert {
        r.k
        for r in engine.sql(
            "SELECT k FROM plain_b WHERE name = 'Apple'"
        ).collect()
    } == {1}
    # the declaring table folds, bare and alias-qualified
    assert {
        r.k
        for r in engine.sql(
            "SELECT k FROM ci_scope_a WHERE name = 'APPLE'"
        ).collect()
    } == {1, 2}
    assert {
        r.k
        for r in engine.sql(
            "SELECT a.k FROM ci_scope_a a WHERE a.name = 'APPLE'"
        ).collect()
    } == {1, 2}
    assert {
        r.k
        for r in engine.sql(
            "SELECT b.k FROM plain_b b WHERE b.name = 'APPLE'"
        ).collect()
    } == set()
    # mixed join key: only one side is _ci → binary compare preserved
    n = engine.sql(
        "SELECT COUNT(*) AS n FROM ci_scope_a a JOIN plain_b b "
        "ON a.name = b.name"
    ).collect()[0].n
    assert n == 2
    engine.sql("DROP TABLE ci_scope_a")
    engine.sql("DROP TABLE plain_b")


def test_drop_table_if_exists(engine):
    """ADVICE r4 (medium): DROP TABLE IF EXISTS must route through the
    engine's DDL path (clearing managed/_ci state), not fall through to
    spark.sql; absent table is a no-op (ddl/ddl_api.go ifExists)."""
    engine.sql("DROP TABLE IF EXISTS die_t")  # absent: no-op
    engine.sql(
        "CREATE TABLE die_t (k BIGINT PRIMARY KEY, "
        "name VARCHAR(10) COLLATE utf8mb4_general_ci)"
    )
    engine.sql("INSERT INTO die_t VALUES (1, 'x')")
    engine.sql("DROP TABLE IF EXISTS die_t")
    # re-create succeeds (the r4 bug left stale state → "already exists")
    engine.sql("CREATE TABLE die_t (k BIGINT PRIMARY KEY)")
    engine.sql("DROP TABLE die_t")
    with pytest.raises(ValueError, match="IF EXISTS"):
        engine.sql("TRUNCATE TABLE IF EXISTS die_t")


def test_collation_ci_query_repeatable(spark):
    """BENCH_REPEAT>1 regression: the registered collation query must run
    twice in one session against the same cached engine."""
    from tidb_spark.queries.dialectq import mysqlsql_collation_ci

    a = mysqlsql_collation_ci(spark, TEST_SF_DIR).collect()
    b = mysqlsql_collation_ci(spark, TEST_SF_DIR).collect()
    assert a == b and len(a) > 0


def test_seq_func_in_string_literal_not_rejected(engine):
    """ADVICE r4 (low): a string literal mentioning NEXTVAL(...) must not
    trigger the INSERT…SELECT rejection or substitution."""
    engine.sql("CREATE SEQUENCE lit_seq")
    engine.sql("CREATE TABLE lit_t (id BIGINT PRIMARY KEY, note VARCHAR(40))")
    engine.sql(
        "INSERT INTO lit_t SELECT n_nationkey, 'uses NEXTVAL(lit_seq)' "
        "FROM nation WHERE n_nationkey < 2"
    )
    rows = engine.sql("SELECT note FROM lit_t").collect()
    assert len(rows) == 2
    assert all(r.note == "uses NEXTVAL(lit_seq)" for r in rows)
    engine.sql("DROP TABLE lit_t")
    engine.sql("DROP SEQUENCE lit_seq")


def test_multi_update_conflicting_matches_rejected(engine):
    """ADVICE r4 (low): multi-table UPDATE with >1 distinct assignment row
    per target key is nondeterministic — reject loudly; identical
    assignment rows collapse and succeed."""
    engine.sql("CREATE TABLE mu_c (id BIGINT PRIMARY KEY, v BIGINT)")
    engine.sql("INSERT INTO mu_c VALUES (1, 0)")
    with pytest.raises(ValueError, match="nondeterministic"):
        engine.sql(
            "UPDATE mu_c JOIN region ON mu_c.id <= region.r_regionkey "
            "SET mu_c.v = region.r_regionkey"
        )
    engine.sql(
        "UPDATE mu_c JOIN region ON mu_c.id <= region.r_regionkey "
        "SET mu_c.v = 42"
    )
    assert engine.sql("SELECT v FROM mu_c").collect()[0].v == 42
    engine.sql("DROP TABLE mu_c")


def test_match_multipath_sql_equals_builder(engine, spark):
    """SQL comma multi-path MATCH must produce exactly the union_paths
    builder's rows (buildGraph, logical_plan_builder.go:6484-6506)."""
    from tidb_spark.queries.dialectq import mysqlsql_match_multipath
    from tidb_spark.queries.graphq import graph_match_multipath

    sql_rows = mysqlsql_match_multipath(spark, TEST_SF_DIR).collect()
    df_rows = graph_match_multipath(spark, TEST_SF_DIR).collect()
    assert len(sql_rows) > 0
    assert sql_rows == df_rows


def test_match_multipath_sql_rejections(engine):
    """Parity errors: GROUP BY over a multi-path union and shortest+comma
    are rejected with clear messages."""
    with pytest.raises(NotImplementedError, match="GROUP BY"):
        engine.sql(
            "SELECT a.c_custkey AS k FROM MATCH (v_customer AS a)"
            ".OUT(e_knows AS e), (v_customer AS a).OUT(e_knows AS e) "
            "GROUP BY a.c_custkey"
        )
    with pytest.raises(ValueError, match="comma"):
        engine.sql(
            "SELECT 1 AS x FROM MATCH ANY SHORTEST (v_customer AS a)"
            ".OUT(e_knows AS e).(v_customer AS b), "
            "(v_customer AS c).OUT(e_knows AS e2)"
        )


def test_general_ci_weight_semantics(engine):
    """utf8mb4_general_ci weight pins (util/collate/general_ci.go; the
    derivation in functions/collation.py reproduces the plane tables
    exactly): accent folding, ß=s (single S), Æ its own letter, й=Й
    composed, PAD SPACE, supplementary→U+FFFD."""
    from tidb_spark.functions.collation import general_ci_weight

    assert general_ci_weight(ord("é")) == ord("E")
    assert general_ci_weight(ord("ß")) == ord("S")
    assert general_ci_weight(ord("Æ")) == ord("Æ")
    assert general_ci_weight(ord("æ")) == ord("Æ")
    assert general_ci_weight(ord("й")) == ord("Й")
    assert general_ci_weight(ord("Й")) == ord("Й")
    assert general_ci_weight(ord("ñ")) == ord("N")
    assert general_ci_weight(0x1F600) == 0xFFFD  # supplementary plane
    assert general_ci_weight(ord("ɐ")) == ord("ɐ")  # post-4.0 case pair
    row = engine.sql(
        "SELECT mysql_general_ci_key('straße') AS a, "
        "mysql_general_ci_key('strase') AS b, "
        "mysql_general_ci_key('STRASSE') AS c, "
        "mysql_general_ci_key('x  ') AS d, mysql_general_ci_key('x') AS e"
    ).collect()[0]
    assert row.a == row.b and row.a != row.c and row.d == row.e


def test_enumeration_guard_triggers_on_dense_graph(spark):
    """The exhaustive TOP-k walk's combinatorial-explosion guard: a dense
    clique blows past a tiny max_paths_per_round cap with a clear error
    naming the beam escape hatch; the same search succeeds under beam
    pruning, and a generous cap leaves sparse results unchanged."""
    from pyspark.sql import functions as F

    from tidb_spark.graph.model import default_graph
    from tidb_spark.graph.shortest import top_k_shortest
    from tests.conftest import TEST_SF_DIR

    # K12 clique: every vertex connects to every other.
    verts = spark.range(12).select(F.col("id").cast("long"))
    clique = (
        verts.alias("a")
        .crossJoin(verts.alias("b"))
        .where(F.col("a.id") != F.col("b.id"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    )

    class _Edge:
        name, src_col, dst_col = "clique", "src", "dst"
        df = clique

    sources = spark.range(1).select(F.lit(0).cast("long").alias("root"))
    dsts = spark.range(1).select(F.lit(5).cast("long").alias("dst_id"))
    with pytest.raises(ValueError, match="beam"):
        top_k_shortest(
            sources, dsts, _Edge, k=2, max_hops=6, max_paths_per_round=5_000
        ).collect()
    beamed = top_k_shortest(
        sources, dsts, _Edge, k=2, max_hops=6, beam=2
    ).collect()
    assert len(beamed) == 2  # k paths found, guard-free under the beam

    # Sparse path unchanged under the default cap (same rows as the
    # explicit-cap run).
    g = default_graph(spark, TEST_SF_DIR)
    customer = g.vertex("v_customer").df
    s2 = customer.where(F.col("c_custkey") < 2).select(
        F.col("c_custkey").alias("root")
    )
    d2 = customer.where(F.col("c_custkey").between(5, 8)).select(
        F.col("c_custkey").alias("dst_id")
    )
    a = top_k_shortest(s2, d2, g.edge("e_knows"), k=2, max_hops=3).collect()
    b = top_k_shortest(
        s2, d2, g.edge("e_knows"), k=2, max_hops=3,
        max_paths_per_round=10_000_000,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and len(a) > 0


def test_drop_if_exists_protects_dataset_views(engine):
    """IF EXISTS forgives ABSENCE only: a read-only dataset view (nation)
    must still refuse to drop — otherwise the session's shared fixture
    view would silently vanish."""
    with pytest.raises(ValueError, match="read-only"):
        engine.sql("DROP TABLE IF EXISTS nation")
    # view intact afterwards
    assert engine.sql("SELECT COUNT(*) AS n FROM nation").collect()[0].n > 0


def test_groups_frame_semantics(spark):
    """SQL:2011 GROUPS frame semantics, independently derived: for each
    row, the frame = all rows of the current PEER GROUP (order-key ties)
    plus n groups back / m groups forward.  Hand-computed per-group
    prefix sums over a fixture with real ties pin the dense_rank+RANGE
    emulation (`operators/window_ext.groups_frame`)."""
    from tidb_spark.operators.window_ext import groups_frame
    from pyspark.sql import functions as F

    rows = [
        # (part, key, val) — key ties create multi-row peer groups
        ("a", 1, 10), ("a", 1, 20), ("a", 2, 30), ("a", 3, 40),
        ("a", 3, 50), ("a", 5, 60),
        ("b", 7, 70), ("b", 9, 80),
    ]
    df = spark.createDataFrame(rows, "part string, key int, val long")
    out = {
        (r.part, r.key, r.val): r.s
        for r in groups_frame(
            df, ["part"], ["key"], F.sum("val"),
            preceding=1, following=1, out_col="s",
        ).collect()
    }
    # part a groups: {1: 30, 2: 30, 3: 90, 5: 60}
    assert out[("a", 1, 10)] == out[("a", 1, 20)] == 30 + 30       # g1+g2
    assert out[("a", 2, 30)] == 30 + 30 + 90                        # g1+g2+g3
    assert out[("a", 3, 40)] == out[("a", 3, 50)] == 30 + 90 + 60   # g2+g3+g5
    assert out[("a", 5, 60)] == 90 + 60                             # g3+g5
    # part b: two singleton groups, adjacent
    assert out[("b", 7, 70)] == 150 and out[("b", 9, 80)] == 150
    # preceding=0, following=0 degenerates to the peer group itself
    cur = {
        (r.part, r.key, r.val): r.s
        for r in groups_frame(
            df, ["part"], ["key"], F.sum("val"),
            preceding=0, following=0, out_col="s",
        ).collect()
    }
    assert cur[("a", 1, 10)] == 30 and cur[("a", 3, 50)] == 90
    with pytest.raises(ValueError, match="groups"):
        groups_frame(df, ["part"], ["key"], F.sum("val"),
                     preceding=-1, following=0)


def test_explain_statement_form(engine):
    """Statement-form EXPLAIN (what a MySQL client sends): plain, FORMAT=,
    and ANALYZE route through the engine's plan machinery and return the
    plan as rows; dialect rewrites apply to the body (a MATCH clause
    explains without error)."""
    rows = engine.sql("EXPLAIN SELECT c_custkey FROM customer WHERE c_custkey < 5").collect()
    text = "\n".join(r.plan for r in rows)
    assert "Physical Plan" in text or "Scan" in text
    brief = engine.sql(
        "EXPLAIN FORMAT=BRIEF SELECT COUNT(*) FROM orders"
    ).collect()
    assert any("Aggregate" in r.plan or "Scan" in r.plan for r in brief)
    ana = engine.sql(
        "EXPLAIN ANALYZE SELECT COUNT(*) AS n FROM nation"
    ).collect()
    assert any("rows" in r.plan.lower() or "Scan" in r.plan for r in ana)
    m = engine.sql(
        "EXPLAIN SELECT a.c_custkey FROM MATCH (v_customer AS a)"
        ".OUT(e_knows).(v_customer AS b)"
    ).collect()
    assert len(m) > 0
    with pytest.raises(ValueError, match="FORMAT"):
        engine.sql("EXPLAIN FORMAT=BOGUS SELECT 1")


def test_explain_table_is_describe(engine):
    """MySQL: EXPLAIN <table> == DESCRIBE <table> (the parser treats them
    identically)."""
    a = engine.sql("EXPLAIN nation").collect()
    b = engine.sql("DESC nation").collect()
    assert a == b and len(a) > 0


def test_collation_dispatch_rejects_unsupported(engine):
    """VERDICT r5 #2a: a declared collation outside the reference's
    newCollatorMap (util/collate/collate.go:355) must raise loudly at
    CREATE time — never silently alias to another collation's
    semantics (utf8mb4_0900_ai_ci...).  gbk_chinese_ci moved to the
    supported map in r8 (functions/collation_gbk.py); pinyin moved to
    DDL-accepted/use-rejected in r9 (test below), matching the
    reference's registry exactly."""
    for bad in ("gbk_bin", "utf8mb4_0900_ai_ci", "latin1_swedish_ci"):
        with pytest.raises(NotImplementedError, match="not supported"):
            engine.sql(
                f"CREATE TABLE rej_t (k BIGINT PRIMARY KEY, "
                f"name VARCHAR(10) COLLATE {bad})"
            )
        engine.sql("DROP TABLE IF EXISTS rej_t")


def test_collation_pinyin_ddl_accepts_use_rejects(engine):
    """utf8mb4_zh_pinyin_tidb_as_cs, exact reference parity (VERDICT r8
    #4 adjudicated): the reference ACCEPTS the name in DDL
    (ddl/serial_test.go:1565 ALTER TABLE … COLLATE …pinyin… MustExec)
    but its collator is an unimplemented stub — Compare/Key/Pattern all
    panic("implement me") (util/collate/pinyin_tidb_as_cs.go:22-34),
    the name is hidden from SHOW COLLATION (collate.go:237 "under
    developing, should not be shown to user"), and it ships NO weight
    table to derive-and-verify against (gbk_chinese_ci_data.go has no
    pinyin counterpart).  So: CREATE succeeds, any collation-aware
    comparison raises loudly, and queries NOT touching the column's
    collation still work."""
    engine.sql(
        "CREATE TABLE py_t (k BIGINT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE utf8mb4_zh_pinyin_tidb_as_cs)"
    )
    engine.sql("INSERT INTO py_t VALUES (1, 'a'), (2, 'B')")
    # Collation-independent access is fine.
    assert engine.sql("SELECT COUNT(*) AS n FROM py_t").collect()[0].n == 2
    # Any comparison that needs the collation's key function panics in
    # the reference; here it raises with the adjudication.
    for q in (
        "SELECT k FROM py_t WHERE name = 'A'",
        "SELECT k FROM py_t ORDER BY name",
    ):
        with pytest.raises(NotImplementedError, match="panic stub"):
            engine.sql(q)
    engine.sql("DROP TABLE py_t")


def test_unicode_ci_vs_general_ci_divergence(engine):
    """The two _ci collations must dispatch to different key functions:
    general_ci weighs ß as a single 'S' (straße ≠ STRASSE), unicode_ci
    expands ß to 'ss' (straße = STRASSE) — util/collate/general_ci.go
    vs unicode_ci.go on the same input."""
    engine.sql(
        "CREATE TABLE d_gen (k BIGINT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE utf8mb4_general_ci)"
    )
    engine.sql(
        "CREATE TABLE d_uni (k BIGINT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE utf8mb4_unicode_ci)"
    )
    for t in ("d_gen", "d_uni"):
        engine.sql(f"INSERT INTO {t} VALUES (1, 'straße'), (2, 'STRASSE')")
    gen = {r.k for r in engine.sql(
        "SELECT k FROM d_gen WHERE name = 'STRASSE'").collect()}
    uni = {r.k for r in engine.sql(
        "SELECT k FROM d_uni WHERE name = 'STRASSE'").collect()}
    assert gen == {2}, "general_ci: ß='s', straße != STRASSE"
    assert uni == {1, 2}, "unicode_ci: ß='ss', straße == STRASSE"
    # and Æ stays its own letter under BOTH (the reference's unicode_ci
    # table gives it weight 0xE38 — not the DUCET A+E expansion)
    for t in ("d_gen", "d_uni"):
        engine.sql(f"INSERT INTO {t} VALUES (3, 'Æsir'), (4, 'AEsir')")
        hit = {r.k for r in engine.sql(
            f"SELECT k FROM {t} WHERE name = 'æsir'").collect()}
        assert hit == {3}, t
    engine.sql("DROP TABLE d_gen")
    engine.sql("DROP TABLE d_uni")


def test_gbk_chinese_ci_weights_match_reference_table(engine):
    """functions/collation_gbk.py vs the reference's 65536-entry table
    (util/collate/gbk_chinese_ci_data.go) — exhaustive, every BMP
    codepoint, plus the supplementary-plane 0x3F rule.  Skipped when the
    reference checkout is absent."""
    import os
    import re as _re

    ref = "/root/reference/util/collate/gbk_chinese_ci_data.go"
    if not os.path.exists(ref):
        pytest.skip("reference checkout not available")
    from tidb_spark.functions.collation_gbk import gbk_ci_weight

    src = open(ref).read()
    body = src[src.index("gbkChineseCISortKeyTable"):]
    nums = _re.findall(
        r"0x[0-9A-Fa-f]+", body[body.index("{"): body.rindex("}")]
    )
    table = [int(x, 16) for x in nums]
    assert len(table) == 0x10000
    bad = [r for r in range(0x10000) if gbk_ci_weight(r) != table[r]]
    assert not bad, [hex(b) for b in bad[:10]]
    assert gbk_ci_weight(0x1F600) == 0x3F  # supplementary -> '?'


def test_gbk_chinese_ci_collation(engine):
    """gbk_chinese_ci end-to-end (util/collate/gbk_chinese_ci.go):
    pinyin-major hanzi ORDER BY, ASCII case fold, the '~'=Y table quirk,
    non-GBK runes weighing 0x3F ('?'), PAD SPACE equality, LIKE NO PAD,
    and GROUP BY folding."""
    engine.sql("DROP TABLE IF EXISTS gbk_t")
    engine.sql(
        "CREATE TABLE gbk_t (k BIGINT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE gbk_chinese_ci)"
    )
    engine.sql(
        "INSERT INTO gbk_t VALUES (1, '中国'), (2, '八方'), (3, '啊'), "
        "(4, 'BEIJING'), (5, 'beijing'), (6, '大'), (7, '擦拭'), "
        "(8, '中國'), (9, '?!'), (10, '😀!'), (11, '~x'), (12, 'yx')"
    )
    # Pinyin-major order; ASCII (incl. '?'=0x3F) before hanzi; the
    # '~'->0x59 quirk makes '~x' sort exactly with 'Yx'.
    out = engine.sql("SELECT k FROM gbk_t ORDER BY name, k").collect()
    assert [r.k for r in out] == [9, 10, 4, 5, 11, 12, 3, 2, 7, 6, 1, 8], [
        r.k for r in out
    ]
    # Equalities: case fold, non-GBK -> '?', '~' = 'y'.
    hits = {r.k for r in engine.sql(
        "SELECT k FROM gbk_t WHERE name = 'Beijing'").collect()}
    assert hits == {4, 5}
    hits = {r.k for r in engine.sql(
        "SELECT k FROM gbk_t WHERE name = '?!'").collect()}
    assert hits == {9, 10}, "U+1F600 weighs 0x3F == '?'"
    hits = {r.k for r in engine.sql(
        "SELECT k FROM gbk_t WHERE name = 'YX'").collect()}
    assert hits == {11, 12}, "'~' sorts equal to 'Y' in MySQL's table"
    # PAD SPACE: trailing blanks ignored by =, honored by LIKE.
    hits = {r.k for r in engine.sql(
        "SELECT k FROM gbk_t WHERE name = '中国  '").collect()}
    assert hits == {1}
    hits = {r.k for r in engine.sql(
        "SELECT k FROM gbk_t WHERE name LIKE '中国  '").collect()}
    assert hits == set()
    # GROUP BY folds to one group per collation key.
    groups = engine.sql(
        "SELECT min(name) AS rep, COUNT(*) AS n FROM gbk_t "
        "GROUP BY name ORDER BY name"
    ).collect()
    assert [(g.rep, g.n) for g in groups][:3] == [
        ("?!", 2), ("BEIJING", 2), ("yx", 2)
    ]
    assert len(groups) == 9
    engine.sql("DROP TABLE gbk_t")


def test_ci_mixed_collation_join_raises(engine):
    """general_ci = unicode_ci join keys: MySQL raises 'illegal mix of
    collations' (expression/collation.go CheckAndDeriveCollation);
    silently picking one side would give that side's equalities."""
    engine.sql(
        "CREATE TABLE mix_g (k BIGINT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE utf8mb4_general_ci)"
    )
    engine.sql(
        "CREATE TABLE mix_u (k BIGINT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE utf8mb4_unicode_ci)"
    )
    with pytest.raises(ValueError, match="illegal mix"):
        engine.sql(
            "SELECT COUNT(*) AS n FROM mix_g a JOIN mix_u b "
            "ON a.name = b.name"
        )
    engine.sql("DROP TABLE mix_g")
    engine.sql("DROP TABLE mix_u")


def test_ci_like_is_no_pad(engine):
    """ADVICE r5 (low): MySQL LIKE is NO PAD even on PAD SPACE
    collations — col LIKE 'abc ' must NOT match 'abc', while = does
    (stringutil.CompilePatternInner matches rune-by-rune without
    trailing-space truncation)."""
    engine.sql(
        "CREATE TABLE np_t (k BIGINT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE utf8mb4_general_ci)"
    )
    engine.sql("INSERT INTO np_t VALUES (1, 'abc'), (2, 'abc ')")
    eq = {r.k for r in engine.sql(
        "SELECT k FROM np_t WHERE name = 'ABC '").collect()}
    like_trail = {r.k for r in engine.sql(
        "SELECT k FROM np_t WHERE name LIKE 'ABC '").collect()}
    like_bare = {r.k for r in engine.sql(
        "SELECT k FROM np_t WHERE name LIKE 'ABC'").collect()}
    assert eq == {1, 2}, "= is PAD SPACE: both match"
    assert like_trail == {2}, "LIKE 'abc ' matches only the padded row"
    assert like_bare == {1}, "LIKE 'abc' matches only the exact row"
    engine.sql("DROP TABLE np_t")


def test_ci_comma_from_list_detected(engine):
    """ADVICE r5 (medium): a _ci table referenced via a comma-separated
    FROM list (FROM other, ci_t / self-join FROM ci_t t1, ci_t t2) must
    activate the shim just like FROM ... JOIN."""
    engine.sql(
        "CREATE TABLE cf_ci (k BIGINT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE utf8mb4_general_ci)"
    )
    engine.sql("CREATE TABLE cf_plain (k BIGINT PRIMARY KEY, v VARCHAR(10))")
    engine.sql("INSERT INTO cf_ci VALUES (1, 'Apple'), (2, 'apple')")
    engine.sql("INSERT INTO cf_plain VALUES (1, 'x')")
    n = engine.sql(
        "SELECT COUNT(*) AS n FROM cf_plain p, cf_ci c "
        "WHERE c.name = 'APPLE' AND p.k = 1"
    ).collect()[0].n
    assert n == 2, "comma-FROM _ci table folds"
    n2 = engine.sql(
        "SELECT COUNT(*) AS n FROM cf_ci t1, cf_ci t2 "
        "WHERE t1.name = t2.name AND t1.k <= t2.k"
    ).collect()[0].n
    assert n2 == 3, "self comma-join folds both sides (2 pairs + 1 cross)"
    engine.sql("DROP TABLE cf_ci")
    engine.sql("DROP TABLE cf_plain")


def test_ci_block_scoped_resolution(engine):
    """VERDICT r5 #9: resolution is per subquery block — an outer table's
    `name` stays binary while the inner block's _ci `name` folds, in ONE
    statement (previously statement-scoped: the subquery's _ci table
    leaked onto the outer column)."""
    engine.sql(
        "CREATE TABLE bs_ci (k BIGINT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE utf8mb4_general_ci)"
    )
    engine.sql("CREATE TABLE bs_plain (k BIGINT PRIMARY KEY, name VARCHAR(20))")
    engine.sql("INSERT INTO bs_ci VALUES (1, 'Alpha'), (2, 'alpha')")
    engine.sql("INSERT INTO bs_plain VALUES (1, 'Alpha'), (2, 'ALPHA')")
    # outer references ONLY bs_plain; the subquery references bs_ci.
    # outer name = 'ALPHA' must stay binary (match only k=2) even though
    # the inner block's _ci table declares a column of the same name;
    # the inner block folds (matches both bs_ci rows -> k IN (1, 2)).
    rows = engine.sql(
        "SELECT k FROM bs_plain WHERE name = 'ALPHA' "
        "AND k IN (SELECT k FROM bs_ci WHERE name = 'ALPHA')"
    ).collect()
    assert {r.k for r in rows} == {2}
    # and the inner block standalone DID fold both rows
    inner = engine.sql(
        "SELECT k FROM bs_ci WHERE name = 'ALPHA'"
    ).collect()
    assert {r.k for r in inner} == {1, 2}
    engine.sql("DROP TABLE bs_ci")
    engine.sql("DROP TABLE bs_plain")


def test_bin_collation_is_pad_space(engine):
    """Declared *_bin collations are PAD SPACE in MySQL
    (binPaddingCollator, util/collate/collate.go): 'abc ' = 'abc' but
    case still matters; undeclared columns keep Spark's NO PAD binary."""
    engine.sql(
        "CREATE TABLE pb_t (k BIGINT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE utf8mb4_bin, raw VARCHAR(20))"
    )
    engine.sql("INSERT INTO pb_t VALUES (1, 'abc ', 'abc ')")
    assert [r.k for r in engine.sql(
        "SELECT k FROM pb_t WHERE name = 'abc'").collect()] == [1]
    assert [r.k for r in engine.sql(
        "SELECT k FROM pb_t WHERE name = 'ABC'").collect()] == []
    assert [r.k for r in engine.sql(
        "SELECT k FROM pb_t WHERE raw = 'abc'").collect()] == []
    engine.sql("DROP TABLE pb_t")


def test_ci_in_and_between_fold(engine):
    """IN lists and BETWEEN ranges over a _ci column fold every operand
    through the collation key (builtin_compare.go dispatches all
    comparison builtins through the column collator)."""
    engine.sql(
        "CREATE TABLE ib_t (k BIGINT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE utf8mb4_general_ci)"
    )
    engine.sql(
        "INSERT INTO ib_t VALUES (1, 'Apple'), (2, 'banana'), (3, 'Cherry')"
    )
    got = {r.k for r in engine.sql(
        "SELECT k FROM ib_t WHERE name IN ('APPLE', 'CHERRY')"
    ).collect()}
    assert got == {1, 3}
    got = {r.k for r in engine.sql(
        "SELECT k FROM ib_t WHERE name BETWEEN 'AAA' AND 'BBB'"
    ).collect()}
    assert got == {1, 2}, "banana < BBB case-insensitively"
    engine.sql("DROP TABLE ib_t")


def test_explain_analyze_no_driver_collect(engine, monkeypatch):
    """VERDICT r5 #5: EXPLAIN ANALYZE must execute via a noop-format
    write + observe() metrics, never collect() — on a large result the
    old collect made EXPLAIN ANALYZE itself the driver bottleneck.  The
    post-AQE plan must still be the FINAL adaptive plan."""
    from pyspark.sql import DataFrame

    def boom(self):
        raise AssertionError("collect() on the EXPLAIN ANALYZE path")

    monkeypatch.setattr(DataFrame, "collect", boom)
    text = engine.explain_analyze(
        "SELECT n_regionkey, COUNT(*) AS c FROM nation GROUP BY n_regionkey"
    )
    assert text.startswith("-- rows: 5\n")
    assert "isFinalPlan=true" in text


def test_explain_format_json_is_json(engine):
    """ADVICE r5 (low): EXPLAIN FORMAT=JSON returns ONE row holding a
    parseable JSON document (callers parse it — tree text broke them)."""
    import json

    rows = engine.sql(
        "EXPLAIN FORMAT=JSON SELECT n_name FROM nation WHERE n_nationkey = 3"
    ).collect()
    assert len(rows) == 1
    doc = json.loads(rows[0].plan)
    assert isinstance(doc, list) and doc, "TreeNode JSON: array of nodes"


def test_json_unquote_invalid_inputs(engine):
    """ADVICE r5 (low): a quoted-looking but invalid JSON text must fall
    through unmodified — never a fabricated partial value ('"a","b"'
    previously returned 'a' via the concat-array trick)."""
    r = engine.sql(
        "SELECT JSON_UNQUOTE('\"a\",\"b\"') AS bad, "
        "JSON_UNQUOTE('\"ok\"') AS good, "
        "JSON_UNQUOTE('plain') AS plain"
    ).collect()[0]
    assert r.bad == '"a","b"'
    assert r.good == "ok"
    assert r.plain == "plain"


def test_match_comma_derived_table_not_swallowed(engine):
    """ADVICE r5 (low): `FROM MATCH (...).OUT(...).(...), (SELECT ...) x`
    — the parenthesized derived table after the MATCH path belongs to
    the FROM list, not to multi-path MATCH parsing."""
    out = engine.sql(
        "SELECT src.c_custkey AS k, x.one AS one "
        "FROM MATCH (v_customer AS src WHERE src.c_custkey < 5)"
        ".OUT(e_knows).(v_customer AS dst), (SELECT 1 AS one) x "
        "ORDER BY k"
    ).collect()
    assert len(out) > 0 and all(r.one == 1 for r in out)


def test_match_comma_path_kind_rejected(engine):
    """ADVICE r5 (low): a comma path with its own ANY SHORTEST prefix
    must raise a clear parity error instead of leaving raw MATCH text
    for Spark to choke on."""
    with pytest.raises(ValueError, match="after a comma"):
        engine.sql(
            "SELECT 1 AS x FROM MATCH (v_customer AS a).OUT(e_knows)"
            ".(v_customer AS b), ANY SHORTEST (v_customer AS c)"
            ".OUT(e_knows)*.(v_customer AS d)"
        )


def test_ci_groupby_fold_aliased_and_expression_projection(engine):
    """ADVICE r6 (medium): the _ci GROUP BY fold must not double-alias
    an aliased projection (`name AS label` became `min(name) AS name AS
    label`, a ParseException) and must keep expression context for a
    depth-0 expression occurrence (`name || '!'`)."""
    engine.sql(
        "CREATE TABLE gbf_ci (k BIGINT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE utf8mb4_general_ci)"
    )
    engine.sql(
        "INSERT INTO gbf_ci VALUES (1, 'Alpha'), (2, 'alpha'), (3, 'BETA')"
    )
    rows = engine.sql(
        "SELECT name AS label, COUNT(*) AS n FROM gbf_ci "
        "GROUP BY name ORDER BY label"
    ).collect()
    assert [(r.label, r.n) for r in rows] == [("Alpha", 2), ("BETA", 1)]
    rows = engine.sql(
        "SELECT name || '!' AS deco, COUNT(*) AS n FROM gbf_ci "
        "GROUP BY name ORDER BY deco"
    ).collect()
    assert [(r.deco, r.n) for r in rows] == [("Alpha!", 2), ("BETA!", 1)]
    # bare projection still pins the representative's output name
    rows = engine.sql(
        "SELECT name, COUNT(*) AS n FROM gbf_ci GROUP BY name ORDER BY name"
    ).collect()
    assert [(r.name, r.n) for r in rows] == [("Alpha", 2), ("BETA", 1)]
    engine.sql("DROP TABLE gbf_ci")


def test_ci_groupby_fold_union_branches(engine):
    """ADVICE r6 (medium): a depth-0 UNION of grouped selects over _ci
    columns folds each branch's OWN GROUP BY + SELECT list (previously
    the last GROUP BY paired with the first SELECT list: branch 1
    grouped case-sensitively, branch 2 failed analysis)."""
    engine.sql(
        "CREATE TABLE gbu_ci (k BIGINT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE utf8mb4_general_ci)"
    )
    engine.sql(
        "INSERT INTO gbu_ci VALUES (1, 'Alpha'), (2, 'alpha'), (3, 'BETA')"
    )
    rows = engine.sql(
        "SELECT name, COUNT(*) AS n FROM gbu_ci GROUP BY name "
        "UNION ALL "
        "SELECT name, COUNT(*) AS n FROM gbu_ci GROUP BY name"
    ).collect()
    assert sorted((r.name, r.n) for r in rows) == [
        ("Alpha", 2), ("Alpha", 2), ("BETA", 1), ("BETA", 1),
    ]
    # mixed: only one branch grouped — the other stays untouched
    rows = engine.sql(
        "SELECT name, COUNT(*) AS n FROM gbu_ci GROUP BY name "
        "UNION ALL SELECT name, k AS n FROM gbu_ci WHERE k = 3"
    ).collect()
    assert sorted((r.name, r.n) for r in rows) == [
        ("Alpha", 2), ("BETA", 1), ("BETA", 3),
    ]
    engine.sql("DROP TABLE gbu_ci")


def test_match_splice_qualified_comma_item():
    """ADVICE r6 (low): a qualified comma item (db.tbl) after a MATCH
    segment must be consumed whole — stopping at `db` spliced the
    hoisted WHERE inside the item."""
    from tidb_spark.sqlshim.match_clause import splice

    sql = "SELECT * FROM MATCHSEG, db.tbl t WHERE x = 1"
    start = sql.index("MATCHSEG")
    out = splice(
        sql, start, start + len("MATCHSEG"),
        "edges e JOIN nodes v ON e.dst = v.id", ["v.id > 0"],
    )
    assert out == (
        "SELECT * FROM edges e JOIN nodes v ON e.dst = v.id, db.tbl t "
        "WHERE v.id > 0 AND x = 1"
    )


def test_json_table_lowering_and_rejections(engine):
    """JSON_TABLE (executed extension — no parser.y production in the
    reference): PATH columns are typed get_json_object casts, FOR
    ORDINALITY counts from 1 per source row, scalar arrays and '$[*]'
    roots work, and every unsupported clause fails loudly instead of
    silently misreading."""
    # Scalar array + '$[*]' root + ordinality restart per row.
    out = engine.sql(
        "WITH src AS (SELECT n_nationkey AS k, "
        "CONCAT('[', n_nationkey, ',', n_nationkey + 10, ']') AS j "
        "FROM nation WHERE n_nationkey < 2) "
        "SELECT s.k, jt.rn, jt.v FROM src s, "
        "JSON_TABLE(s.j, '$[*]' COLUMNS ("
        "v BIGINT PATH '$', rn FOR ORDINALITY)) AS jt "
        "ORDER BY s.k, jt.rn"
    ).collect()
    assert [(r.k, r.rn, r.v) for r in out] == [
        (0, 1, 0), (0, 2, 10), (1, 1, 1), (1, 2, 11),
    ]
    # Missing path -> NULL (never an error).
    out = engine.sql(
        "SELECT jt.x FROM (SELECT '[{\"a\":1}]' AS j) s, "
        "JSON_TABLE(s.j, '$[*]' COLUMNS (x INT PATH '$.missing')) AS jt"
    ).collect()
    assert [r.x for r in out] == [None]
    # MySQL parity: empty row-path array / NULL document -> ZERO rows,
    # never a spurious all-NULL row (r7 advice fix).
    for doc in ("'[]'", "CAST(NULL AS STRING)", "'{\"other\":1}'"):
        out = engine.sql(
            f"SELECT jt.x FROM (SELECT {doc} AS j) s, "
            "JSON_TABLE(s.j, '$[*]' COLUMNS (x INT PATH '$')) AS jt"
        ).collect()
        assert out == [], doc
    # Arrays of JSON strings: from_json unquotes string elements, so
    # PATH '$' must fall back to the raw element (r7 advice fix).
    out = engine.sql(
        "SELECT jt.v FROM (SELECT '[\"a\",\"b\"]' AS j) s, "
        "JSON_TABLE(s.j, '$[*]' COLUMNS (v VARCHAR(5) PATH '$')) AS jt "
        "ORDER BY jt.v"
    ).collect()
    assert [r.v for r in out] == ["a", "b"]
    # Loud rejections.
    for bad, msg in [
        (
            "JSON_TABLE(s.j, '$' COLUMNS (x INT PATH '$.a')) AS jt",
            "row path",
        ),
        (
            "JSON_TABLE(s.j, '$[*]' COLUMNS ("
            "NESTED PATH '$.b[*]' COLUMNS (y INT PATH '$'), "
            "NESTED PATH '$.c[*]' COLUMNS (z INT PATH '$'))) AS jt",
            "sibling NESTED",
        ),
        (
            "JSON_TABLE(s.j, '$[*]' COLUMNS (NESTED PATH '$.b[*]' "
            "COLUMNS (NESTED PATH '$.c[*]' COLUMNS (y INT PATH '$')))) "
            "AS jt",
            "NESTED within NESTED",
        ),
        (
            "JSON_TABLE(s.j, '$[*]' COLUMNS (x INT EXISTS PATH '$.a')) AS jt",
            "EXISTS",
        ),
        (
            "JSON_TABLE(s.j, '$[*]' COLUMNS "
            "(x INT PATH '$.a' DEFAULT '0' ON EMPTY)) AS jt",
            "DEFAULT",
        ),
    ]:
        with pytest.raises(ValueError, match=msg):
            engine.sql(f"SELECT 1 FROM (SELECT '[1]' AS j) s, {bad}")


def test_json_table_nested_path(engine):
    """One level of NESTED PATH: inner array rows join their parent,
    empty/missing inner arrays keep the parent row with NULL nested
    columns (MySQL outer semantics), and nested FOR ORDINALITY restarts
    per parent row."""
    out = engine.sql(
        "SELECT jt.g, jt.nrn, jt.v FROM (SELECT "
        "'[{\"g\":1,\"xs\":[10,20]},{\"g\":2,\"xs\":[]},{\"g\":3}]' AS j"
        ") s, JSON_TABLE(s.j, '$[*]' COLUMNS ("
        "g INT PATH '$.g', "
        "NESTED PATH '$.xs[*]' COLUMNS ("
        "nrn FOR ORDINALITY, v BIGINT PATH '$'))) AS jt "
        "ORDER BY jt.g, jt.nrn"
    ).collect()
    assert [(r.g, r.nrn, r.v) for r in out] == [
        (1, 1, 10), (1, 2, 20), (2, None, None), (3, None, None),
    ]
    # Column order follows declaration order, nested spliced in place.
    cols = engine.sql(
        "SELECT jt.* FROM (SELECT '[{\"g\":1,\"xs\":[5]}]' AS j) s, "
        "JSON_TABLE(s.j, '$[*]' COLUMNS (rn FOR ORDINALITY, "
        "NESTED PATH '$.xs[*]' COLUMNS (v INT PATH '$'), "
        "g INT PATH '$.g')) AS jt"
    ).columns
    assert cols == ["rn", "v", "g"]
    # A string literal mentioning JSON_TABLE( must NOT trigger lowering.
    out = engine.sql("SELECT 'use JSON_TABLE(x)' AS note").collect()
    assert out[0].note == "use JSON_TABLE(x)"


def test_with_rollup_lowering(engine):
    """MySQL ``GROUP BY ... WITH ROLLUP`` (executed extension — the
    reference grammar carries the form only in a comment,
    parser/parser.y:13846) lowers to standard ROLLUP: super-aggregate
    rows appear with NULL keys, subqueries rewrite independently, and
    string literals never trigger the rewrite."""
    out = engine.sql(
        "SELECT n_regionkey AS rk, COUNT(*) AS n FROM nation "
        "GROUP BY n_regionkey WITH ROLLUP ORDER BY rk NULLS LAST"
    ).collect()
    assert len(out) == 6  # 5 regions + 1 grand total
    assert out[-1].rk is None and out[-1].n == 25
    assert sum(r.n for r in out[:-1]) == 25
    # Two grouping columns: per-pair, per-first, grand total.
    out = engine.sql(
        "SELECT n_regionkey AS rk, n_nationkey % 2 AS par, COUNT(*) AS n "
        "FROM nation GROUP BY n_regionkey, n_nationkey % 2 WITH ROLLUP"
    ).collect()
    counts = {}
    for r in out:
        counts[(r.rk, r.par)] = r.n
    assert counts[(None, None)] == 25
    assert sum(v for (rk, par), v in counts.items()
               if rk is not None and par is None) == 25
    # Literal mentioning the keywords is untouched.
    out = engine.sql("SELECT 'GROUP BY x WITH ROLLUP' AS s").collect()
    assert out[0].s == "GROUP BY x WITH ROLLUP"


def test_match_against_boolean_weighting(engine):
    """r8 executed extension: > doubles, < halves, ~ flips to -0.5x, ()
    groups with multiplicative distribution, +(group) gates on any
    member, -(group) prohibits all members; relevance floors at 0.
    MySQL documents only the direction of these operators - the exact
    factors are this engine's documented choice (sqlshim/fulltext.py)."""
    rows = engine.sql(
        "SELECT s, MATCH(s) AGAINST("
        "'+apple +(>turnover <strudel) ~pie' IN BOOLEAN MODE) AS rel "
        "FROM (SELECT 'apple turnover' AS s "
        "UNION ALL SELECT 'apple strudel' "
        "UNION ALL SELECT 'apple turnover pie' "
        "UNION ALL SELECT 'apple pie' "
        "UNION ALL SELECT 'turnover strudel') "
        "ORDER BY s"
    ).collect()
    got = {r.s: r.rel for r in rows}
    assert got == {
        "apple turnover": 3.0,        # 1 + 2
        "apple strudel": 1.5,         # 1 + 0.5
        "apple turnover pie": 2.5,    # 1 + 2 - 0.5
        "apple pie": 0.0,             # +(group) gate fails
        "turnover strudel": 0.0,      # +apple gate fails
    }
    # ~-only match floors at 0 (never negative); -(group) prohibits all.
    rows = engine.sql(
        "SELECT s, MATCH(s) AGAINST('cat ~dog' IN BOOLEAN MODE) AS r1, "
        "MATCH(s) AGAINST('cat -(dog bird)' IN BOOLEAN MODE) AS r2 "
        "FROM (SELECT 'dog kennel' AS s UNION ALL SELECT 'cat dog' "
        "UNION ALL SELECT 'cat bird' UNION ALL SELECT 'cat') ORDER BY s"
    ).collect()
    got = {r.s: (r.r1, r.r2) for r in rows}
    assert got == {
        "dog kennel": (0.0, 0.0),   # ~dog alone: 0-floored; -group: dog present
        "cat dog": (0.5, 0.0),      # 1 - 0.5; prohibited
        "cat bird": (1.0, 0.0),     # bird prohibited in r2
        "cat": (1.0, 1.0),
    }
    # Nested weights distribute multiplicatively: >(>x) = 4x.
    rows = engine.sql(
        "SELECT MATCH(s) AGAINST('>(>x)' IN BOOLEAN MODE) AS rel "
        "FROM (SELECT 'x marks' AS s)"
    ).collect()
    assert rows[0].rel == 4.0


def test_match_against_fulltext(engine):
    """MATCH ... AGAINST (executed extension — the reference parses
    ast.MatchAgainst, parser/parser.y:5182, but no planner rule consumes
    it): natural-language mode scores matched-term count, boolean mode
    honors +/-/*/phrases, bare predicates in WHERE coerce like MySQL,
    and unsupported forms raise."""
    # Natural-language (default) relevance + bare WHERE coercion.
    out = engine.sql(
        "SELECT r_name, MATCH(r_name) AGAINST('ASIA EUROPE') AS rel "
        "FROM region WHERE MATCH(r_name) AGAINST('ASIA EUROPE') "
        "ORDER BY r_name"
    ).collect()
    assert [(r.r_name, r.rel) for r in out] == [("ASIA", 1.0), ("EUROPE", 1.0)]
    # Boolean mode: wildcard, required+prohibited, phrase.
    out = engine.sql(
        "SELECT r_name FROM region "
        "WHERE MATCH(r_name) AGAINST('A*' IN BOOLEAN MODE) ORDER BY r_name"
    ).collect()
    assert [r.r_name for r in out] == ["AFRICA", "AMERICA", "ASIA"]
    out = engine.sql(
        "SELECT r_name FROM region "
        "WHERE MATCH(r_name) AGAINST('+A* -ASIA' IN BOOLEAN MODE) "
        "ORDER BY r_name"
    ).collect()
    assert [r.r_name for r in out] == ["AFRICA", "AMERICA"]
    out = engine.sql(
        'SELECT r_name FROM region WHERE MATCH(r_name) '
        "AGAINST('\"MIDDLE EAST\"' IN BOOLEAN MODE)"
    ).collect()
    assert [r.r_name for r in out] == ["MIDDLE EAST"]
    # Multi-column doc: nation name + joined region name.
    out = engine.sql(
        "SELECT COUNT(*) AS n FROM nation n JOIN region r "
        "ON n.n_regionkey = r.r_regionkey "
        "WHERE MATCH(n.n_name, r.r_name) AGAINST('ASIA' IN BOOLEAN MODE)"
    ).collect()
    assert out[0].n == 5
    # Loud rejections (> < ~ and grouping became executed extensions in
    # r8; @proximity stays rejected).
    for bad, msg in [
        ("MATCH(r_name) AGAINST(r_comment)", "string literal"),
        ("MATCH(r_name) AGAINST('\"a b\" @4' IN BOOLEAN MODE)", "operator"),
        ("MATCH(r_name) AGAINST('+a +(b' IN BOOLEAN MODE)", "unbalanced"),
    ]:
        with pytest.raises(ValueError, match=msg):
            engine.sql(f"SELECT 1 FROM region WHERE {bad}")
    # NULL documents never match, never error.
    out = engine.sql(
        "SELECT MATCH(s) AGAINST('x') AS rel "
        "FROM (SELECT CAST(NULL AS STRING) AS s)"
    ).collect()
    assert out[0].rel == 0.0
    # Bare predicate in HAVING position coerces to boolean (r7 advice
    # fix: HAVING was missing from the boolean-position token list).
    out = engine.sql(
        "SELECT r_name, COUNT(*) AS n FROM region GROUP BY r_name "
        "HAVING MATCH(r_name) AGAINST('ASIA') ORDER BY r_name"
    ).collect()
    assert [r.r_name for r in out] == ["ASIA"]
    # THEN is a VALUE position — the relevance DOUBLE must come through
    # un-coerced (MySQL returns the score, not a boolean).
    out = engine.sql(
        "SELECT CASE WHEN r_regionkey >= 0 THEN "
        "MATCH(r_name) AGAINST('ASIA') ELSE 0.0 END AS rel "
        "FROM region WHERE r_name = 'ASIA'"
    ).collect()
    assert out[0].rel > 0.0


def test_tablesample_regions(engine, spark, tmp_path):
    """TABLESAMPLE REGIONS() (executor/sample.go:42 — first row per
    storage region) lowers to first-scan-order-row per parquet file: row
    count equals file count, rows are stable across runs, and the form
    composes with WHERE/aliases."""
    import os

    from tidb_spark.catalog import load_table
    from tests.conftest import TEST_SF_DIR

    dest = os.path.join(str(tmp_path), "ev4.parquet")
    load_table(spark, TEST_SF_DIR, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(dest)
    spark.read.parquet(dest).createOrReplaceTempView("ev4")
    out = engine.sql("SELECT event_id FROM ev4 TABLESAMPLE REGIONS()")
    rows1 = sorted(r.event_id for r in out.collect())
    assert len(rows1) == 4  # one row per file
    rows2 = sorted(
        r.event_id
        for r in engine.sql(
            "SELECT event_id FROM ev4 TABLESAMPLE REGIONS()"
        ).collect()
    )
    assert rows1 == rows2  # deterministic
    # Alias + predicate compose.
    out = engine.sql(
        "SELECT s.event_id FROM ev4 TABLESAMPLE REGIONS() AS s "
        "WHERE s.event_id >= 0"
    ).collect()
    assert len(out) == 4
    # Single-file dataset view: exactly one row.
    out = engine.sql("SELECT COUNT(*) AS n FROM nation TABLESAMPLE REGIONS()").collect()
    assert out[0].n >= 1


def test_with_recursive_sql_surface(engine):
    """WITH RECURSIVE through Engine.sql: the UNION ALL form runs on
    Spark's native recursion; the UNION (distinct) form — which Spark
    rejects but the reference executes with hashtable dedup
    (executor/cte.go) — lowers to the fixpoint round driver and
    terminates on cycles."""
    # Native UNION ALL path.
    out = engine.sql(
        "WITH RECURSIVE seq(n) AS ("
        "SELECT 1 UNION ALL SELECT n + 1 FROM seq WHERE n < 6) "
        "SELECT SUM(n) AS s, COUNT(*) AS c FROM seq"
    ).collect()
    assert (out[0].s, out[0].c) == (21, 6)
    # UNION DISTINCT on a CYCLIC step: only dedup terminates this.
    out = engine.sql(
        "WITH RECURSIVE r(n) AS ("
        "SELECT 1 UNION SELECT (n % 4) + 1 FROM r) "
        "SELECT n FROM r ORDER BY n"
    ).collect()
    assert [x.n for x in out] == [1, 2, 3, 4]
    # Real tables + trailing plain CTE after the recursive one.
    out = engine.sql(
        "WITH RECURSIVE chain(k) AS ("
        "SELECT CAST(0 AS BIGINT) AS k "
        "UNION SELECT n.n_nationkey FROM nation n JOIN chain c "
        "ON n.n_nationkey = c.k + 5), "
        "lab AS (SELECT k, k * 2 AS dbl FROM chain) "
        "SELECT k, dbl FROM lab ORDER BY k"
    ).collect()
    assert [(r.k, r.dbl) for r in out] == [
        (0, 0), (5, 10), (10, 20), (15, 30), (20, 40),
    ]
    # Seed referencing itself is rejected loudly.
    with pytest.raises(ValueError, match="seed member"):
        engine.sql(
            "WITH RECURSIVE bad(n) AS ("
            "SELECT n FROM bad UNION SELECT 1) SELECT * FROM bad"
        )


def test_rename_table_statement(engine):
    """RENAME TABLE a TO b[, c TO d] (ddl/ddl_api.go RenameTable) moves
    managed tables and re-aliases in one statement; old names stop
    resolving."""
    engine.sql("DROP TABLE IF EXISTS rt_a")
    engine.sql("DROP TABLE IF EXISTS rt_b")
    engine.sql("CREATE TABLE rt_a (k BIGINT, v VARCHAR(10))")
    engine.sql("INSERT INTO rt_a VALUES (1, 'x'), (2, 'y')")
    engine.sql("RENAME TABLE rt_a TO rt_b")
    out = engine.sql("SELECT COUNT(*) AS n FROM rt_b").collect()
    assert out[0].n == 2
    with pytest.raises(Exception):
        engine.sql("SELECT * FROM rt_a").collect()
    # Multi-pair form.
    engine.sql("CREATE TABLE rt_c (k BIGINT)")
    engine.sql("RENAME TABLE rt_b TO rt_d, rt_c TO rt_e")
    assert engine.sql("SELECT COUNT(*) AS n FROM rt_d").collect()[0].n == 2
    engine.sql("DROP TABLE IF EXISTS rt_d")
    engine.sql("DROP TABLE IF EXISTS rt_e")


def test_select_into_user_vars(engine):
    """SELECT ... INTO @a, @b: stores a one-row result into user
    variables (readable via @a), errors on >1 row or column-count
    mismatch, leaves variables unchanged on zero rows, and never fires
    on INTO inside a string literal."""
    engine.sql("SELECT COUNT(*), MAX(n_nationkey) INTO @cnt, @mx FROM nation")
    out = engine.sql("SELECT @cnt AS c, @mx AS m").collect()
    assert (out[0].c, out[0].m) == (25, 24)
    with pytest.raises(ValueError, match="more than one row"):
        engine.sql("SELECT n_nationkey INTO @x FROM nation")
    with pytest.raises(ValueError, match="variables"):
        engine.sql("SELECT 1, 2 INTO @only FROM nation LIMIT 1")
    # Zero rows: unchanged.
    engine.sql("SELECT n_nationkey INTO @cnt FROM nation WHERE n_nationkey < 0")
    assert engine.sql("SELECT @cnt AS c").collect()[0].c == 25
    # Literal containing ' INTO @v' is just a string.
    out = engine.sql("SELECT 'go INTO @v' AS s").collect()
    assert out[0].s == "go INTO @v"


def test_quantified_subquery_comparisons(engine):
    """x <op> ALL|ANY|SOME (SELECT ...) — Spark's parser rejects the
    form; the reference decorrelates it (expression_rewriter.go
    handleCompareSubquery).  The lowering must honor MySQL's three-valued
    semantics: empty-set ALL is TRUE / ANY is FALSE, NULLs in the set
    make undecided comparisons NULL, and = ANY / <> ALL are IN / NOT IN."""
    # Basic ordering quantifiers over real data.
    out = engine.sql(
        "SELECT n_name FROM nation WHERE n_nationkey >= ALL "
        "(SELECT n_nationkey FROM nation)"
    ).collect()
    assert [r.n_name for r in out] == ["NATION_24"]
    out = engine.sql(
        "SELECT COUNT(*) AS n FROM nation WHERE n_nationkey > ANY "
        "(SELECT n_nationkey FROM nation WHERE n_regionkey = 0)"
    ).collect()
    # strictly greater than the smallest region-0 nation key
    mn = engine.sql(
        "SELECT MIN(n_nationkey) AS m FROM nation WHERE n_regionkey = 0"
    ).collect()[0].m
    expect = engine.sql(
        f"SELECT COUNT(*) AS n FROM nation WHERE n_nationkey > {mn}"
    ).collect()[0].n
    assert out[0].n == expect
    # Empty set: ALL -> TRUE for every row, ANY -> FALSE.
    assert len(engine.sql(
        "SELECT 1 FROM nation WHERE n_nationkey > ALL "
        "(SELECT n_nationkey FROM nation WHERE n_nationkey < 0)"
    ).collect()) == 25
    assert engine.sql(
        "SELECT 1 FROM nation WHERE n_nationkey > ANY "
        "(SELECT n_nationkey FROM nation WHERE n_nationkey < 0)"
    ).collect() == []
    # NULL in the set: undecided comparisons are NULL (filtered out),
    # decided-FALSE stays FALSE.
    out = engine.sql(
        "SELECT x FROM (SELECT 5 AS x) WHERE x > ALL "
        "(SELECT CASE WHEN y = 1 THEN NULL ELSE y END FROM "
        "(SELECT 1 AS y UNION ALL SELECT 3 AS y))"
    ).collect()
    assert out == []  # 5 > 3 holds but the NULL leaves ALL undecided
    out = engine.sql(
        "SELECT x FROM (SELECT 2 AS x) WHERE x > ALL "
        "(SELECT CASE WHEN y = 1 THEN NULL ELSE y END FROM "
        "(SELECT 1 AS y UNION ALL SELECT 3 AS y))"
    ).collect()
    assert out == []  # decided FALSE by 3
    # = ANY == IN; <> ALL == NOT IN; SOME == ANY.
    assert len(engine.sql(
        "SELECT 1 FROM nation WHERE n_nationkey = ANY "
        "(SELECT n_nationkey FROM nation WHERE n_regionkey = 1)"
    ).collect()) == 5
    assert len(engine.sql(
        "SELECT 1 FROM nation WHERE n_nationkey <> ALL "
        "(SELECT n_nationkey FROM nation WHERE n_regionkey = 1)"
    ).collect()) == 20
    assert len(engine.sql(
        "SELECT 1 FROM nation WHERE n_nationkey >= SOME "
        "(SELECT n_nationkey FROM nation WHERE n_regionkey = 1)"
    ).collect()) > 0
    # UNION ALL ( / MATCH ALL ( must not trigger the rewrite.
    out = engine.sql(
        "SELECT COUNT(*) AS n FROM (SELECT 1 UNION ALL (SELECT 2))"
    ).collect()
    assert out[0].n == 2


def test_quantified_three_valued_logic_exhaustive(engine):
    """Exhaustive 3VL conformance for quantified comparisons: every
    (set shape x lhs x operator x quantifier) combination — 288 cells —
    must match the MySQL three-valued reference semantics computed in
    Python.  Each set shape runs as ONE engine query with 48 predicate
    columns, so the sweep is 6 plans, not 288."""
    import operator as _op

    OPS = {">": _op.gt, ">=": _op.ge, "<": _op.lt, "<=": _op.le,
           "=": _op.eq, "<>": _op.ne}

    def ref(x, S, op, quant):
        def cmp3(s):
            if x is None or s is None:
                return None
            return OPS[op](x, s)
        vals = [cmp3(s) for s in S]
        if quant == "ALL":
            if not vals:
                return True
            if any(v is False for v in vals):
                return False
            if any(v is None for v in vals):
                return None
            return True
        if not vals:
            return False
        if any(v is True for v in vals):
            return True
        if any(v is None for v in vals):
            return None
        return False

    SETS = [[], [1], [None], [1, 3], [None, 3], [None, 1, 3]]
    XS = [None, 0, 2, 4]

    def lit(v):
        return "CAST(NULL AS INT)" if v is None else str(v)

    for S in SETS:
        if S:
            rows = ", ".join(f"({lit(s)})" for s in S)
            sub = f"SELECT y FROM VALUES {rows} AS v(y)"
        else:
            sub = "SELECT y FROM (SELECT 1 AS y) WHERE 1 = 0"
        cols, want = [], []
        for xi, x in enumerate(XS):
            for oi, op in enumerate(OPS):
                for quant in ("ALL", "ANY"):
                    cols.append(
                        f"({lit(x)}) {op} {quant} ({sub}) "
                        f"AS c{len(cols)}"
                    )
                    want.append(ref(x, S, op, quant))
        row = engine.sql("SELECT " + ", ".join(cols)).collect()[0]
        got = [row[i] for i in range(len(cols))]
        assert got == want, (S, [
            (i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w
        ])


def test_quantified_in_having_and_select_list(engine):
    """Quantified comparisons compose in HAVING and the SELECT list (the
    rewrite is position-independent); JSON_TABLE accepts DECIMAL-typed
    PATH columns; three-column ZORDER parses and preserves content."""
    # SELECT-list position returns the boolean itself.
    out = engine.sql(
        "SELECT n_nationkey >= ALL (SELECT n_nationkey FROM nation) AS top "
        "FROM nation WHERE n_nationkey IN (0, 24) ORDER BY n_nationkey"
    ).collect()
    assert [r.top for r in out] == [False, True]
    # HAVING position.
    out = engine.sql(
        "SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey "
        "HAVING COUNT(*) >= ALL (SELECT COUNT(*) FROM nation GROUP BY n_regionkey) "
        "ORDER BY n_regionkey"
    ).collect()
    assert len(out) == 5 and all(r.n == 5 for r in out)  # all regions tie
    # JSON_TABLE DECIMAL column type.
    out = engine.sql(
        "SELECT jt.d FROM (SELECT '[{\"d\": \"12.50\"}]' AS j) s, "
        "JSON_TABLE(s.j, '$[*]' COLUMNS (d DECIMAL(6,2) PATH '$.d')) AS jt"
    ).collect()
    assert str(out[0].d) == "12.50"


def test_optimize_zorder_three_columns(engine, spark, tmp_path):
    """ZORDER over three columns: content unchanged, statement accepted."""
    from pyspark.sql import functions as F

    eng = engine
    eng.sql("DROP TABLE IF EXISTS z3")
    eng.sql("CREATE TABLE z3 (id BIGINT, x BIGINT, y BIGINT, w BIGINT)")
    spark.range(1024).select(
        F.col("id"),
        (F.col("id") % 16).alias("x"),
        ((F.col("id") * 7) % 16).alias("y"),
        ((F.col("id") * 13) % 16).alias("w"),
    ).createOrReplaceTempView("z3src")
    eng.sql("INSERT INTO z3 SELECT * FROM z3src")
    before = eng.sql("SELECT SUM(id) AS s FROM z3").collect()[0].s
    eng.sql("OPTIMIZE z3 ZORDER BY (x, y, w)")
    after = eng.sql("SELECT SUM(id) AS s, COUNT(*) AS n FROM z3").collect()[0]
    assert (after.s, after.n) == (before, 1024)
    eng.sql("DROP TABLE IF EXISTS z3")


def test_sequence_insert_select_per_row(engine):
    """NEXTVAL inside INSERT … SELECT allocates once per SOURCE ROW via
    batch reservation + a row_number() expression (ddl/sequence.go
    allocator driven per row from executor/insert_common.go) — the r11
    residual named-parity gap.  Covers: per-row values, LASTVAL after
    the statement, multiple sites per row, CYCLE wrap mid-batch,
    non-CYCLE exhaustion raising before any row lands, and the
    still-rejected SETVAL form."""
    import pytest as _pytest

    engine.sql("CREATE SEQUENCE iss START WITH 10 INCREMENT BY 5")
    engine.sql("CREATE TABLE iss_t (id BIGINT PRIMARY KEY, nk BIGINT)")
    engine.sql(
        "INSERT INTO iss_t SELECT NEXTVAL(iss), n_nationkey FROM nation "
        "WHERE n_regionkey = 0 ORDER BY n_nationkey"
    )
    got = sorted(r.id for r in engine.sql("SELECT id FROM iss_t").collect())
    n = len(got)
    assert n == 5  # 5 AFRICA nations in the TPC-H fixture
    assert got == [10 + 5 * i for i in range(n)]  # distinct, stepped by 5
    # The session counter advanced past the batch; LASTVAL is the last
    # reserved value.
    assert engine.sql("SELECT LASTVAL(iss) AS v").collect()[0].v == 30
    assert engine.sql("SELECT NEXTVAL(iss) AS v").collect()[0].v == 35

    # Two sites in one row: row i takes reservations 2i and 2i+1.
    engine.sql("CREATE TABLE iss_2 (a BIGINT, b BIGINT)")
    engine.sql(
        "INSERT INTO iss_2 SELECT NEXTVAL(iss), NEXTVAL(iss) FROM nation "
        "WHERE n_regionkey = 1"
    )
    rows = engine.sql("SELECT a, b FROM iss_2").collect()
    vals = sorted(v for r in rows for v in (r.a, r.b))
    assert vals == [40 + 5 * i for i in range(2 * len(rows))]
    assert all(r.b - r.a == 5 for r in rows)  # sites are adjacent per row

    # CYCLE wraps mid-batch; non-CYCLE raises BEFORE writing anything.
    engine.sql("CREATE SEQUENCE cyc START WITH 4 MAXVALUE 5 CYCLE")
    engine.sql("CREATE TABLE cyc_t (id BIGINT, nk BIGINT)")
    engine.sql(
        "INSERT INTO cyc_t SELECT NEXTVAL(cyc), n_nationkey FROM nation "
        "WHERE n_regionkey = 0"
    )
    ids = sorted(r.id for r in engine.sql("SELECT id FROM cyc_t").collect())
    assert ids == [1, 2, 3, 4, 5]  # 4,5 then wrap to 1,2,3
    assert engine.sql("SELECT NEXTVAL(cyc) AS v").collect()[0].v == 4
    engine.sql("CREATE SEQUENCE short MAXVALUE 3")
    with _pytest.raises(ValueError, match="run out"):
        engine.sql(
            "INSERT INTO cyc_t SELECT NEXTVAL(short), n_nationkey "
            "FROM nation WHERE n_regionkey = 0"
        )
    # atomic: the failed statement inserted nothing and burned nothing
    assert engine.sql("SELECT COUNT(*) AS c FROM cyc_t").collect()[0].c == 5
    assert engine.sql("SELECT NEXTVAL(short) AS v").collect()[0].v == 1

    # Zero-row source: valid statement, counter untouched (the iss_2
    # two-site batch over 5 rows left lastval at 40 + 5*9 = 85).
    assert engine.sql("SELECT LASTVAL(iss) AS v").collect()[0].v == 85
    engine.sql(
        "INSERT INTO iss_t SELECT NEXTVAL(iss), n_nationkey FROM nation "
        "WHERE n_regionkey = 99"
    )
    assert engine.sql("SELECT LASTVAL(iss) AS v").collect()[0].v == 85

    # A string literal mentioning 'NEXTVAL(iss)' must not allocate.
    engine.sql("CREATE TABLE iss_s (t VARCHAR(32), id BIGINT)")
    engine.sql(
        "INSERT INTO iss_s SELECT 'NEXTVAL(iss) literal', NEXTVAL(iss) "
        "FROM nation WHERE n_nationkey = 0"
    )
    assert [r.id for r in engine.sql("SELECT id FROM iss_s").collect()] == [90]

    with _pytest.raises(ValueError, match="SETVAL"):
        engine.sql(
            "INSERT INTO iss_t SELECT SETVAL(iss, 9), n_nationkey FROM nation"
        )
    for ddl in ("DROP SEQUENCE iss", "DROP SEQUENCE cyc",
                "DROP SEQUENCE short", "DROP TABLE iss_t",
                "DROP TABLE iss_2", "DROP TABLE cyc_t", "DROP TABLE iss_s"):
        engine.sql(ddl)
