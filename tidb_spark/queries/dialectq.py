"""MySQL-dialect SQL queries routed through ``Engine.sql`` — these prove the
translation layer (sqlshim) end-to-end under the driver's oracle gate: each
entry is a MySQL-dialect string the reference would accept, executed by our
engine, hash-compared against DuckDB ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tidb_spark.engine import Engine
from tidb_spark.queries import register

_engines: dict[tuple[int, str], Engine] = {}


def _engine(spark: SparkSession, sf_dir: str) -> Engine:
    key = (id(spark), sf_dir)
    if key not in _engines:
        _engines[key] = Engine(spark, sf_dir)
    return _engines[key]


DATE_FUNCS_ORACLE = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m') AS ym,
       CAST(CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS TIMESTAMP) AS next_month
FROM orders
WHERE o_orderdate > DATE '1996-06-01' - INTERVAL 90 DAY
ORDER BY o_orderkey
LIMIT 50 OFFSET 10
"""


@register("mysqlsql_date_funcs", oracle=DATE_FUNCS_ORACLE, tags=("dialect",))
def mysqlsql_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE_FORMAT %-tokens, DATE_ADD/DATE_SUB INTERVAL arithmetic, and
    MySQL ``LIMIT offset, count`` — all rewritten by the translator."""
    return _engine(spark, sf_dir).sql(
        "SELECT o_orderkey, DATE_FORMAT(o_orderdate, '%Y-%m') AS ym, "
        "CAST(CAST(DATE_ADD(o_orderdate, INTERVAL 1 MONTH) AS DATE) AS TIMESTAMP)"
        " AS next_month "
        "FROM orders "
        "WHERE o_orderdate > DATE_SUB(DATE '1996-06-01', INTERVAL 90 DAY) "
        "ORDER BY o_orderkey LIMIT 10, 50"
    )


GROUP_CONCAT_ORACLE = """
SELECT n_regionkey,
       string_agg(n_name, '|' ORDER BY n_name) AS names,
       string_agg(n_name, ',' ORDER BY n_nationkey DESC) AS by_key_desc
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""


@register("mysqlsql_group_concat", oracle=GROUP_CONCAT_ORACLE, tags=("dialect",))
def mysqlsql_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP_CONCAT(expr ORDER BY expr SEPARATOR s) →
    concat_ws + sort_array(collect_list); when the ORDER BY key differs from
    the aggregated expression, a struct-sort lowering keys the sort on the
    ORDER BY column, not the values (func_group_concat.go)."""
    return _engine(spark, sf_dir).sql(
        "SELECT n_regionkey, "
        "GROUP_CONCAT(n_name ORDER BY n_name SEPARATOR '|') AS names, "
        "GROUP_CONCAT(n_name ORDER BY n_nationkey DESC) AS by_key_desc "
        "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"
    )


STRING_MISC_ORACLE = """
SELECT n_nationkey,
       CASE n_name WHEN 'NATION_3' THEN 1 WHEN 'NATION_7' THEN 2 ELSE 0 END AS f,
       ('16909060' || '') AS conv_rt,
       16909060 AS ia,
       '1.2.3.4' AS inn,
       regexp_matches(n_name, 'NATION_[0-9]$') AS single_digit
FROM nation ORDER BY n_nationkey
"""


@register("mysqlsql_string_misc", oracle=STRING_MISC_ORACLE, tags=("dialect",))
def mysqlsql_string_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIELD (CASE lowering), CONV round-trip, INET_ATON/INET_NTOA inverse
    pair, REGEXP → RLIKE."""
    return _engine(spark, sf_dir).sql(
        "SELECT n_nationkey, "
        "FIELD(n_name, 'NATION_3', 'NATION_7') AS f, "
        "CONV(CONV('16909060', 10, 16), 16, 10) AS conv_rt, "
        "INET_ATON('1.2.3.4') AS ia, "
        "INET_NTOA(16909060) AS inn, "
        "n_name REGEXP 'NATION_[0-9]$' AS single_digit "
        "FROM nation ORDER BY n_nationkey"
    )


JSON_READ_ORACLE = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS VARCHAR) AS k
FROM events
WHERE event_id < 100
ORDER BY event_id
"""


@register("mysqlsql_json_read", oracle=JSON_READ_ORACLE, tags=("dialect", "json"))
def mysqlsql_json_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_EXTRACT → get_json_object over the events props column
    (builtin_json.go; JSON mutators are pytest-covered — their text output
    formatting is engine-specific)."""
    return _engine(spark, sf_dir).sql(
        "SELECT event_id, JSON_EXTRACT(props, '$.k') AS k "
        "FROM events WHERE event_id < 100 ORDER BY event_id"
    )


MATCH_SQL_ORACLE = """
WITH e_knows AS (
  SELECT a.o_custkey AS src, b.o_custkey AS dst
  FROM orders a JOIN orders b ON a.o_orderkey = b.o_orderkey - 1
  WHERE a.o_custkey <> b.o_custkey
)
SELECT s.c_custkey AS src_key, d.c_name AS friend_name
FROM customer s
JOIN e_knows e ON e.src = s.c_custkey
JOIN customer d ON d.c_custkey = e.dst
WHERE s.c_custkey < 20
ORDER BY src_key, friend_name
"""


@register("mysqlsql_match_1hop", oracle=MATCH_SQL_ORACLE, tags=("dialect", "graph"))
def mysqlsql_match_1hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM MATCH one-hop OUT lowered to the join chain
    (buildGraphPathSimple, logical_plan_builder.go:6579-6708) — through the
    SQL surface, not the DataFrame builder."""
    return _engine(spark, sf_dir).sql(
        "SELECT src.c_custkey AS src_key, dst.c_name AS friend_name "
        "FROM MATCH (v_customer AS src WHERE src.c_custkey < 20)"
        ".OUT(e_knows).(v_customer AS dst) "
        "ORDER BY src_key, friend_name"
    )
