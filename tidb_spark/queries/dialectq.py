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


# The events.props docs are '{"k": <int>}' — the oracle reconstructs every
# mutator's exact output text (the engine's mutators re-serialize compact,
# types/json/binary.go formatting), pinning JSON_SET/INSERT/REMOVE/
# ARRAY_APPEND/MERGE_PATCH/UNQUOTE/VALID/KEYS/LENGTH/TYPE/DEPTH/
# CONTAINS_PATH plus the INET6 and COMPRESS families' round trips.
JSON_MUTATE_ORACLE = """
SELECT event_id,
       '{"k":' || event_id || '}' AS set_doc,
       '{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR)
           || ',"tag":"' || event_type || '"}' AS ins_doc,
       '{}' AS rm_doc,
       '[1,2,' || event_id || ']' AS app_doc,
       '{"v":1}' AS patch_doc,
       'x' AS uq,
       TRUE AS jv,
       '["a","k"]' AS ks,
       CAST(1 AS INTEGER) AS ln,
       'OBJECT' AS jt,
       CAST(2 AS INTEGER) AS jd,
       TRUE AS has_k,
       '::1' AS ip6,
       event_type AS rt
FROM events
WHERE event_id < 200
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


@register(
    "mysqlsql_json_mutate", oracle=JSON_MUTATE_ORACLE, tags=("dialect", "json")
)
def mysqlsql_json_mutate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON mutator family through the SQL surface (builtin_json.go
    jsonSet/jsonInsert/jsonRemove/jsonArrayAppend/jsonMergePatch + the
    inspector tail): Arrow-batched pandas UDFs for the nested walkers,
    inlined SQL scalar UDFs (codegen) for UNQUOTE/VALID/KEYS/LENGTH —
    never row-at-a-time Python (plan-pinned in test_plans).  INET6 and
    COMPRESS round-trips ride along to pin the binary pandas tier."""
    return _engine(spark, sf_dir).sql(
        "SELECT event_id, "
        "JSON_SET(props, '$.k', event_id) AS set_doc, "
        "JSON_INSERT(props, '$.tag', event_type) AS ins_doc, "
        "JSON_REMOVE(props, '$.k') AS rm_doc, "
        "JSON_ARRAY_APPEND('[1,2]', '$', event_id) AS app_doc, "
        "JSON_MERGE_PATCH(props, '{\"k\":null,\"v\":1}') AS patch_doc, "
        "JSON_UNQUOTE('\"x\"') AS uq, "
        "JSON_VALID(props) AS jv, "
        "JSON_KEYS(JSON_INSERT(props, '$.a', 1)) AS ks, "
        "JSON_LENGTH(props) AS ln, "
        "JSON_TYPE(props) AS jt, "
        "JSON_DEPTH(props) AS jd, "
        "JSON_CONTAINS_PATH(props, 'one', '$.k') AS has_k, "
        "INET6_NTOA(INET6_ATON('::1')) AS ip6, "
        "UNCOMPRESS(COMPRESS(event_type)) AS rt "
        "FROM events WHERE event_id < 200 ORDER BY event_id"
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


from tidb_spark.queries.graphq import MATCH_MULTIPATH_ORACLE


@register(
    "mysqlsql_match_multipath",
    # Same oracle as the DataFrame-builder twin graph_match_multipath —
    # the SQL lowering and union_paths must agree exactly.
    oracle=MATCH_MULTIPATH_ORACLE,
    tags=("dialect", "graph"),
)
def mysqlsql_match_multipath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comma-separated multi-path MATCH through the SQL surface: each path
    lowers to its join chain and the branches UNION ALL (buildGraph,
    logical_plan_builder.go:6484-6506).  Same result as the DataFrame
    builder query ``graph_match_multipath`` (union_paths), pinned by the
    identical oracle."""
    return _engine(spark, sf_dir).sql(
        "SELECT a.c_custkey AS src_id, e.dst AS dst_id "
        "FROM MATCH (v_customer AS a "
        "      WHERE a.c_mktsegment = 'BUILDING' AND a.c_custkey < 300)"
        ".OUT(e_knows AS e), "
        "(v_customer AS a "
        "      WHERE a.c_mktsegment = 'MACHINERY' AND a.c_custkey < 300)"
        ".OUT(e_knows AS e) "
        "ORDER BY src_id, dst_id"
    )


DATETIME_LONGTAIL_ORACLE = """
WITH base AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d, epoch(o_orderdate) AS ep
  FROM orders WHERE o_orderkey < 300
), wk AS (
  SELECT o_orderkey, d, ep,
         d - to_days(dayofweek(d)::INT) AS sun
  FROM base
), wk2 AS (
  SELECT *,
         date_trunc('year', sun) AS jan1,
         date_trunc('year', sun)
           + to_days(((7 - dayofweek(date_trunc('year', sun))::INT) % 7)) AS fs
  FROM wk
)
SELECT o_orderkey,
       CAST(date_diff('day', DATE '1970-01-01', d) + 719528 AS BIGINT) AS to_days_v,
       CAST(CAST(ep + 62167219200 AS BIGINT) AS BIGINT)                AS to_secs_v,
       CAST(DATE '1970-01-01' + to_days((date_diff('day', DATE '1970-01-01', d))::INT)
            AS TIMESTAMP)                                              AS from_days_rt,
       lpad(((o_orderkey * 37 % 86400) // 3600)::VARCHAR, 2, '0')
         || ':' ||
       lpad(((o_orderkey * 37 % 3600) // 60)::VARCHAR, 2, '0')
         || ':' ||
       lpad((o_orderkey * 37 % 60)::VARCHAR, 2, '0')                   AS sec_to_time_v,
       CAST(o_orderkey * 37 % 86400 AS BIGINT)                         AS time_to_sec_rt,
       CAST(make_date(EXTRACT(YEAR FROM d)::INT, 1, 1)
            + to_days((o_orderkey % 365)::INT) AS TIMESTAMP)           AS makedate_v,
       CAST((EXTRACT(YEAR FROM d)::BIGINT * 12 + EXTRACT(MONTH FROM d)::BIGINT - 1
             + o_orderkey % 7) // 12 * 100
            + ((EXTRACT(YEAR FROM d)::BIGINT * 12 + EXTRACT(MONTH FROM d)::BIGINT - 1
                + o_orderkey % 7) % 12) + 1 AS BIGINT)                 AS period_add_v,
       CAST(EXTRACT(YEAR FROM d)::BIGINT * 12 + EXTRACT(MONTH FROM d)::BIGINT
            - 1995 * 12 - 6 AS BIGINT)                                 AS period_diff_v,
       CAST(CASE WHEN EXTRACT(YEAR FROM sun) < EXTRACT(YEAR FROM d) THEN 0
            ELSE date_diff('day', fs, sun) // 7 + 1 END AS BIGINT)     AS week_v,
       CAST(EXTRACT(YEAR FROM sun)::BIGINT * 100
            + date_diff('day', fs, sun) // 7 + 1 AS BIGINT)            AS yearweek_v
FROM wk2
ORDER BY o_orderkey
"""


@register(
    "mysqlsql_datetime_longtail",
    oracle=DATETIME_LONGTAIL_ORACLE,
    tags=("dialect", "datetime"),
)
def mysqlsql_datetime_longtail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime long tail through the translator (builtin_time.go):
    TO_DAYS / TO_SECONDS / FROM_DAYS / SEC_TO_TIME / TIME_TO_SEC (round
    trip) / MAKEDATE / PERIOD_ADD / PERIOD_DIFF / WEEK / YEARWEEK — all
    lowered to codegen-native expressions, no Python UDFs."""
    return _engine(spark, sf_dir).sql(
        "SELECT o_orderkey, "
        "CAST(TO_DAYS(o_orderdate) AS BIGINT) AS to_days_v, "
        "TO_SECONDS(o_orderdate) AS to_secs_v, "
        "CAST(FROM_DAYS(TO_DAYS(o_orderdate) - 719528 + 719528) AS TIMESTAMP)"
        " AS from_days_rt, "
        "SEC_TO_TIME(o_orderkey * 37 % 86400) AS sec_to_time_v, "
        "TIME_TO_SEC(SEC_TO_TIME(o_orderkey * 37 % 86400)) AS time_to_sec_rt, "
        "CAST(MAKEDATE(YEAR(o_orderdate), o_orderkey % 365 + 1) AS TIMESTAMP)"
        " AS makedate_v, "
        "PERIOD_ADD(YEAR(o_orderdate) * 100 + MONTH(o_orderdate), "
        "           o_orderkey % 7) AS period_add_v, "
        "PERIOD_DIFF(YEAR(o_orderdate) * 100 + MONTH(o_orderdate), 199506)"
        " AS period_diff_v, "
        "CAST(WEEK(o_orderdate) AS BIGINT) AS week_v, "
        "YEARWEEK(o_orderdate) AS yearweek_v "
        "FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey"
    )


STRING_LONGTAIL_ORACLE = """
SELECT c_custkey,
       substr(c_name, 3, 8)                       AS mid_v,
       CAST(ord(substr(c_name, 1, 1)) AS BIGINT)  AS ord_v,
       to_base(c_custkey, 8)                      AS oct_v,
       to_base64(encode(c_mktsegment))            AS b64_v,
       c_name                                     AS b64_rt,
       CASE WHEN c_acctbal < 0 THEN '-' ELSE '' END
         || format('{:,}', CAST(abs(c_acctbal) * 100 AS BIGINT) // 100)
         || '.'
         || lpad((CAST(abs(c_acctbal) * 100 AS BIGINT) % 100)::VARCHAR, 2, '0')
                                                  AS format_v,
       '''' || c_name || ''''                     AS quote_v,
       substr(c_name, 1, 2) || 'XY' || substr(c_name, 7)
                                                  AS insert_v,
       chr(65 + (c_custkey % 26)::INT)            AS char_v,
       hex(encode(c_mktsegment))                  AS weight_v,
       CAST(CASE WHEN 10 <= c_custkey % 30 THEN 1 ELSE 0 END
          + CASE WHEN 20 <= c_custkey % 30 THEN 1 ELSE 0 END AS BIGINT)
                                                  AS interval_v,
       round(trunc(c_acctbal * 10) / 10, 1)       AS trunc_v
FROM customer
WHERE c_custkey < 200
ORDER BY c_custkey
"""


@register(
    "mysqlsql_string_longtail",
    oracle=STRING_LONGTAIL_ORACLE,
    tags=("dialect", "string"),
)
def mysqlsql_string_longtail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/misc long tail through the translator (builtin_string.go,
    builtin_math.go): MID / ORD / OCT / TO_BASE64 (+ FROM_BASE64 round
    trip) / FORMAT / QUOTE / INSERT / CHAR / WEIGHT_STRING / INTERVAL /
    TRUNCATE — all codegen-native lowerings."""
    return _engine(spark, sf_dir).sql(
        "SELECT c_custkey, "
        "MID(c_name, 3, 8) AS mid_v, "
        "ORD(c_name) AS ord_v, "
        "OCT(c_custkey) AS oct_v, "
        "TO_BASE64(c_mktsegment) AS b64_v, "
        "CAST(FROM_BASE64(TO_BASE64(c_name)) AS STRING) AS b64_rt, "
        "FORMAT(c_acctbal, 2) AS format_v, "
        "QUOTE(c_name) AS quote_v, "
        "INSERT(c_name, 3, 4, 'XY') AS insert_v, "
        "CHAR(65 + c_custkey % 26) AS char_v, "
        "HEX(WEIGHT_STRING(c_mktsegment)) AS weight_v, "
        "CAST(INTERVAL(c_custkey % 30, 10, 20) AS BIGINT) AS interval_v, "
        "ROUND(TRUNCATE(c_acctbal, 1), 1) AS trunc_v "
        "FROM customer WHERE c_custkey < 200 ORDER BY c_custkey"
    )


HINT_JOIN_ORACLE = """
SELECT c.c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
WHERE c.c_custkey < 500
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@register("mysqlsql_hint_join", oracle=HINT_JOIN_ORACLE, tags=("dialect", "hints"))
def mysqlsql_hint_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer hints (util/hint/, planner/optimize.go): TiDB-style
    /*+ ... */ blocks are recognized — join-method hints map onto Spark's
    hint channel (HASH_JOIN → SHUFFLE_HASH here), the rest strip cleanly
    instead of reaching the translator; results are hint-invariant."""
    return _engine(spark, sf_dir).sql(
        "SELECT /*+ HASH_JOIN(o), MEMORY_QUOTA(64 MB), USE_INDEX(c, PRIMARY) */ "
        "c.c_mktsegment, COUNT(*) AS n_orders, "
        "CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "WHERE c.c_custkey < 500 "
        "GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"
    )


VIEW_JOIN_ORACLE = """
WITH v_bigorders AS (
  SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100000
)
SELECT c.c_mktsegment, COUNT(*) AS n_big
FROM customer c JOIN v_bigorders v ON c.c_custkey = v.o_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@register("mysqlsql_view_join", oracle=VIEW_JOIN_ORACLE, tags=("dialect", "views"))
def mysqlsql_view_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE VIEW + consumption (planner/core/planbuilder.go:411
    buildCreateView): the view expands lazily into the consumer plan —
    filter pushdown still reaches the orders scan through it."""
    eng = _engine(spark, sf_dir)
    eng.sql(
        "CREATE OR REPLACE VIEW v_bigorders AS "
        "SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100000"
    )
    return eng.sql(
        "SELECT c.c_mktsegment, COUNT(*) AS n_big "
        "FROM customer c JOIN v_bigorders v ON c.c_custkey = v.o_custkey "
        "GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"
    )


PREPARE_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE o_custkey = 370 OR o_custkey = 371
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("mysqlsql_prepare", oracle=PREPARE_ORACLE, tags=("dialect", "prepare"))
def mysqlsql_prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-level PREPARE / EXECUTE USING / DEALLOCATE (executor/prepared.go:1;
    planner/core/common_plans.go Execute rebind).  Catalyst re-plans per
    EXECUTE — the bound literal reaches the scan as a pushed filter, which a
    cached generic plan could not do."""
    eng = _engine(spark, sf_dir)
    eng.sql(
        "PREPARE prio_count FROM 'SELECT o_orderpriority, COUNT(*) AS n "
        "FROM orders WHERE o_custkey = ? OR o_custkey = ? "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority'"
    )
    eng.sql("SET @c1 = 370")
    eng.sql("SET @c2 = 371")
    out = eng.sql("EXECUTE prio_count USING @c1, @c2")
    eng.sql("DEALLOCATE PREPARE prio_count")
    return out


COLLATION_CI_ORACLE = """
WITH ci_names AS (
  SELECT n_nationkey AS k,
         CASE WHEN n_nationkey % 2 = 0 THEN UPPER(n_name) ELSE LOWER(n_name) END AS name
  FROM nation
)
SELECT k, name FROM ci_names
WHERE LOWER(name) = LOWER('Nation_3') OR LOWER(name) < LOWER('NATION_11')
ORDER BY LOWER(name), k
"""


@register(
    "mysqlsql_collation_ci", oracle=COLLATION_CI_ORACLE, tags=("dialect", "collation")
)
def mysqlsql_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """*_ci collation shim (util/collate/ — utf8mb4_general_ci is MySQL's
    default): a COLLATE-declared column compares and sorts through the
    engine's general_ci weight-key normalization (functions/collation.py
    derives the NFD-base-uppercase weight table; ASCII-only data folds
    identically to LOWER()); the oracle spells LOWER() out explicitly,
    pinning the shim's semantics (stored case preserved, comparisons
    folded)."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS ci_names")
    eng.sql(
        "CREATE TABLE ci_names (k BIGINT PRIMARY KEY, "
        "name VARCHAR(30) COLLATE utf8mb4_general_ci)"
    )
    eng.sql(
        "INSERT INTO ci_names SELECT n_nationkey, "
        "CASE WHEN n_nationkey % 2 = 0 THEN UPPER(n_name) ELSE LOWER(n_name) END "
        "FROM nation"
    )
    out = eng.sql(
        "SELECT k, name FROM ci_names "
        "WHERE name = 'Nation_3' OR name < 'NATION_11' "
        "ORDER BY name, k"
    )
    # Clean up engine state: the rewrite is table-scoped, but leaving the
    # declaration active would still affect any later query in this shared
    # session that joins ci_names (and the next run's CREATE).  The plan in
    # `out` is already analyzed, so dropping the view is safe.
    eng.sql("DROP TABLE IF EXISTS ci_names")
    return out


# 12-name cycle over nation keys; the oracle spells the general_ci weight
# key explicitly (translate special chars to their weight letter, then
# upper) — É=e, ß=s (single S!), straße≠STRASSE, Æ a letter of its own,
# й=Й — exactly util/collate/general_ci.go's table semantics.
_UNI_NAMES = (
    "Élan", "elan", "éclair", "strase", "straße", "Æsir",
    "aesir", "café", "CAFE", "Ñoño", "nono", "йод",
)
_UNI_CASE_SQL = "CASE n_nationkey % 12 " + " ".join(
    f"WHEN {i} THEN '{n}'" for i, n in enumerate(_UNI_NAMES)
) + " END"

COLLATION_UNICODE_ORACLE = f"""
WITH ci_uni AS (
  SELECT n_nationkey AS k, {_UNI_CASE_SQL} AS name FROM nation
), keyed AS (
  SELECT k, name,
         upper(translate(name, 'ÉéßÑñй', 'EeSNnЙ')) AS ck
  FROM ci_uni
)
SELECT k, name FROM keyed
WHERE ck IN ('ELAN', 'ECLAIR', 'STRASE', 'CAFE', 'NONO', 'ЙОД')
ORDER BY ck, k
"""


@register(
    "mysqlsql_collation_unicode",
    oracle=COLLATION_UNICODE_ORACLE,
    tags=("dialect", "collation"),
)
def mysqlsql_collation_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True utf8mb4_general_ci semantics beyond ASCII
    (util/collate/general_ci.go; functions/collation.py derives the same
    weight table): accented letters fold to their base uppercase (É=e,
    ñ=N), ß weighs as a single 'S' (straße = strase but ≠ STRASSE), Æ
    stays its own letter (≠ AE), Cyrillic й folds to Й composed.  The
    engine rewrites comparisons and ORDER BY through the JVM
    ``mysql_general_ci_key`` translate expression; the oracle spells the
    identical weights with DuckDB translate+upper."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS ci_uni")
    eng.sql(
        "CREATE TABLE ci_uni (k BIGINT PRIMARY KEY, "
        "name VARCHAR(30) COLLATE utf8mb4_general_ci)"
    )
    eng.sql(
        f"INSERT INTO ci_uni SELECT n_nationkey, {_UNI_CASE_SQL} FROM nation"
    )
    out = eng.sql(
        "SELECT k, name FROM ci_uni "
        "WHERE name = 'ELAN' OR name = 'ÉCLAIR' OR name = 'STRASE' "
        "OR name = 'CAFÉ' OR name = 'ÑoÑo' OR name = 'ЙОД' "
        "ORDER BY name, k"
    )
    eng.sql("DROP TABLE IF EXISTS ci_uni")
    return out


# 12-name cycle exercising utf8mb4_unicode_ci (UCA 4.0.0 primary
# weights, util/collate/unicode_ci.go + unicode_ci_data.go): ß expands
# to 'ss' (straße = STRASSE — unlike general_ci!), Œ/ﬁ ligatures expand,
# accents and dakuten are primary-ignorable, katakana = hiragana, and Æ
# keeps its OWN primary (≠ AE — the reference table diverges from
# DUCET here; weight 0xE38 vs A=0xE33,E=0xE8B).
_UCA_NAMES = (
    "straße", "STRASSE", "œuvre", "OEUVRE", "café", "CAFE",
    "Æsir", "AEsir", "ﬁne", "fine", "ヒラガナ", "ひらがな",
)
_UCA_CASE_SQL = "CASE n_nationkey % 12 " + " ".join(
    f"WHEN {i} THEN '{n}'" for i, n in enumerate(_UCA_NAMES)
) + " END"

COLLATION_UCA_ORACLE = f"""
WITH ci_uca AS (
  SELECT n_nationkey AS k, {_UCA_CASE_SQL} AS name FROM nation
), keyed AS (
  SELECT k, name,
         upper(translate(
             replace(replace(replace(name, 'ß', 'ss'), 'œ', 'oe'),
                     'ﬁ', 'fi'),
             'éヒラガナが', 'eひらかなか')) AS ck
  FROM ci_uca
)
SELECT k, name FROM keyed
WHERE ck IN ('STRASSE', 'OEUVRE', 'CAFE', 'ÆSIR', 'FINE', 'ひらかな')
ORDER BY ck, k
"""


@register(
    "mysqlsql_collation_unicode_uca",
    oracle=COLLATION_UCA_ORACLE,
    tags=("dialect", "collation"),
)
def mysqlsql_collation_unicode_uca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """utf8mb4_unicode_ci — real UCA 4.0.0 primary weights
    (util/collate/unicode_ci.go; functions/collation_unicode.py derives
    the same table): ß='ss' so straße = STRASSE (general_ci says ß='s'),
    ligatures Œ/ﬁ expand, accents fold (é=E), katakana equals hiragana
    with voicing marks ignorable, while Æ stays its own letter (the
    reference's table gives it weight 0xE38, distinct from A+E).  The
    engine dispatches the declared collation to the unicode key; the
    oracle spells the identical expansions with DuckDB
    replace+translate+upper."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS ci_uca")
    eng.sql(
        "CREATE TABLE ci_uca (k BIGINT PRIMARY KEY, "
        "name VARCHAR(30) COLLATE utf8mb4_unicode_ci)"
    )
    eng.sql(
        f"INSERT INTO ci_uca SELECT n_nationkey, {_UCA_CASE_SQL} FROM nation"
    )
    out = eng.sql(
        "SELECT k, name FROM ci_uca "
        "WHERE name = 'strasse' OR name = 'Œuvre' OR name = 'CAFÉ' "
        "OR name = 'Æsir' OR name = 'FINE' OR name = 'ひらがな' "
        "ORDER BY name, k"
    )
    eng.sql("DROP TABLE IF EXISTS ci_uca")
    return out


COLLATION_GROUPBY_ORACLE = """
WITH ci_gb AS (
  SELECT n_nationkey AS k,
         CASE WHEN n_nationkey % 2 = 0 THEN UPPER(n_name) ELSE LOWER(n_name) END AS name
  FROM nation
)
SELECT min(name) AS name, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(k) AS BIGINT) AS ksum
FROM ci_gb
GROUP BY upper(name)
ORDER BY upper(min(name))
"""


@register(
    "mysqlsql_collation_groupby",
    oracle=COLLATION_GROUPBY_ORACLE,
    tags=("dialect", "collation"),
)
def mysqlsql_collation_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY over a _ci column folds case like MySQL
    (expression/collation.go — the group key is the collation sort key):
    the engine rewrites ``GROUP BY name`` to group on the general_ci
    weight key and projects ``min(name)`` as the deterministic group
    representative (MySQL surfaces an arbitrary member's case; min is
    the reproducible choice).  Mixed-case nation names collapse to one
    group per name; the oracle groups by upper() explicitly."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS ci_gb")
    eng.sql(
        "CREATE TABLE ci_gb (k BIGINT PRIMARY KEY, "
        "name VARCHAR(30) COLLATE utf8mb4_general_ci)"
    )
    eng.sql(
        "INSERT INTO ci_gb SELECT n_nationkey, "
        "CASE WHEN n_nationkey % 2 = 0 THEN UPPER(n_name) ELSE LOWER(n_name) END "
        "FROM nation"
    )
    out = eng.sql(
        "SELECT name, COUNT(*) AS cnt, SUM(k) AS ksum FROM ci_gb "
        "GROUP BY name ORDER BY name"
    )
    eng.sql("DROP TABLE IF EXISTS ci_gb")
    return out


# gbk_chinese_ci — MySQL's hand-curated pinyin-major sort table
# (util/collate/gbk_chinese_ci.go + gbk_chinese_ci_data.go; the engine's
# functions/collation_gbk.py reproduces all 65536 entries, pytest-pinned).
# The oracle encodes the documented group ranks explicitly: '?'-weighted
# runes (incl. non-GBK like U+1F600) < ASCII letters < hanzi by pinyin
# (啊 a < 八 ba < 中 zhong), 国 before 國 within the 中-prefix pair.

COLLATION_GBK_ORACLE = """
WITH src AS (
  SELECT n_nationkey AS k,
         CASE n_nationkey % 8
           WHEN 0 THEN '中国' WHEN 1 THEN '中國' WHEN 2 THEN '八方'
           WHEN 3 THEN 'BEIJING' WHEN 4 THEN 'beijing ' WHEN 5 THEN '啊'
           WHEN 6 THEN '?!' ELSE '😀!' END AS name,
         CASE n_nationkey % 8
           WHEN 0 THEN 5 WHEN 1 THEN 6 WHEN 2 THEN 4
           WHEN 3 THEN 2 WHEN 4 THEN 2 WHEN 5 THEN 3
           WHEN 6 THEN 1 ELSE 1 END AS grp
  FROM nation
)
SELECT min(name) AS name, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(k) AS BIGINT) AS ksum
FROM src GROUP BY grp ORDER BY grp
"""


@register(
    "mysqlsql_collation_gbk",
    oracle=COLLATION_GBK_ORACLE,
    tags=("dialect", "collation"),
)
def mysqlsql_collation_gbk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gbk_chinese_ci GROUP BY + ORDER BY: hanzi group by pinyin rank
    (the hand-curated MySQL table — NOT GBK code order, which inverts it
    for 9931 of 21791 runes), case-folded ASCII, PAD SPACE trailing
    blanks, and non-GBK runes collapsing to the 0x3F weight so '😀!'
    groups with '?!'.  The engine folds GROUP BY through the gbk key and
    sorts by it; the oracle spells the expected ranks analytically."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP TABLE IF EXISTS ci_gbk")
    eng.sql(
        "CREATE TABLE ci_gbk (k BIGINT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE gbk_chinese_ci)"
    )
    eng.sql(
        "INSERT INTO ci_gbk SELECT n_nationkey, "
        "CASE n_nationkey % 8 "
        "WHEN 0 THEN '中国' WHEN 1 THEN '中國' WHEN 2 THEN '八方' "
        "WHEN 3 THEN 'BEIJING' WHEN 4 THEN 'beijing ' WHEN 5 THEN '啊' "
        "WHEN 6 THEN '?!' ELSE '😀!' END "
        "FROM nation"
    )
    out = eng.sql(
        "SELECT name, COUNT(*) AS cnt, SUM(k) AS ksum FROM ci_gbk "
        "GROUP BY name ORDER BY name"
    )
    eng.sql("DROP TABLE IF EXISTS ci_gbk")
    return out


# MySQL 8 named-window clause (WINDOW w AS (...), parser.y WindowClause) —
# flows through the shim to Spark SQL's native named-window support; both
# OVER w references share the one window definition (and one sort).

WINDOW_NAMED_ORACLE = """
SELECT o_custkey,
       ROW_NUMBER() OVER w AS rn,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT)
         AS cum_cents
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, rn
"""


@register(
    "mysqlsql_window_named",
    oracle=WINDOW_NAMED_ORACLE,
    tags=("dialect", "window"),
)
def mysqlsql_window_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause through the MySQL dialect entry: two window
    functions referencing one named definition (integer-cents running
    sum keeps the oracle exact).  One shuffle + one sort serves both."""
    eng = _engine(spark, sf_dir)
    return eng.sql(
        "SELECT o_custkey, "
        "ROW_NUMBER() OVER w AS rn, "
        "SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS cum_cents "
        "FROM orders "
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) "
        "ORDER BY o_custkey, rn"
    )


# LATERAL derived tables — executed extension: the reference's parser has
# no LATERAL production (parser.y); MySQL 8.0.14 added it and both Spark
# and DuckDB support it natively, so the shim passes it through (same
# extension posture as GROUPS frames / ALL SHORTEST).

LATERAL_ORACLE = """
SELECT c.c_custkey, t.top_cents, t.n_orders
FROM customer c,
     LATERAL (SELECT CAST(MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS top_cents,
                     COUNT(*) AS n_orders
              FROM orders o WHERE o.o_custkey = c.c_custkey) t
WHERE c.c_custkey < 50
ORDER BY c.c_custkey
"""


@register(
    "mysqlsql_lateral", oracle=LATERAL_ORACLE, tags=("dialect", "subquery")
)
def mysqlsql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table through the dialect entry —
    Catalyst decorrelates it into the same aggregate-then-join plan the
    NestedLoopApply family uses (no per-row re-execution)."""
    eng = _engine(spark, sf_dir)
    return eng.sql(
        "SELECT c.c_custkey, t.top_cents, t.n_orders "
        "FROM customer c, "
        "LATERAL (SELECT CAST(MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS top_cents, "
        "COUNT(*) AS n_orders "
        "FROM orders o WHERE o.o_custkey = c.c_custkey) t "
        "WHERE c.c_custkey < 50 "
        "ORDER BY c.c_custkey"
    )


# JSON_TABLE — executed extension (MySQL 8.0.4 surface; the reference's
# parser.y has no JSON_TABLE production).  Lowered by sqlshim/json_table.py
# to a correlated LATERAL posexplode over from_json(..., 'array<string>'),
# so each PATH is evaluated JVM-side by get_json_object — no UDFs.

JSON_TABLE_ORACLE = """
WITH src AS (SELECT n_nationkey AS k FROM nation)
SELECT k, rn, q, s FROM (
  SELECT k, CAST(1 AS BIGINT) AS rn, k AS q, 'a' AS s FROM src
  UNION ALL
  SELECT k, CAST(2 AS BIGINT) AS rn, k * 2 AS q, 'b' AS s FROM src
)
WHERE q % 3 <> 1
ORDER BY k, rn
"""


@register(
    "mysqlsql_json_table", oracle=JSON_TABLE_ORACLE, tags=("dialect", "json")
)
def mysqlsql_json_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_TABLE over a constructed JSON document column: two array
    elements per source row, typed PATH columns + FOR ORDINALITY, with a
    post-explosion filter.  The oracle builds the identical rowset
    analytically (the JSON round-trip is the thing under test)."""
    eng = _engine(spark, sf_dir)
    return eng.sql(
        "WITH src AS (SELECT n_nationkey AS k, CONCAT('{\"items\":[{\"q\":', "
        "n_nationkey, ',\"s\":\"a\"},{\"q\":', n_nationkey * 2, "
        "',\"s\":\"b\"}]}') AS j FROM nation) "
        "SELECT s.k, jt.rn, jt.q, jt.s FROM src s, "
        "JSON_TABLE(s.j, '$.items[*]' COLUMNS ("
        "q BIGINT PATH '$.q', "
        "s VARCHAR(5) PATH '$.s', "
        "rn FOR ORDINALITY)) AS jt "
        "WHERE jt.q % 3 <> 1 "
        "ORDER BY s.k, jt.rn"
    )


JSON_TABLE_NESTED_ORACLE = """
WITH src AS (SELECT n_nationkey AS k FROM nation)
SELECT k, g, nrn, x FROM (
  SELECT k, 1 AS g, CAST(1 AS BIGINT) AS nrn, CAST(k AS BIGINT) AS x FROM src
  UNION ALL
  SELECT k, 1 AS g, CAST(2 AS BIGINT) AS nrn, CAST(k + 10 AS BIGINT) AS x FROM src
  UNION ALL
  SELECT k, 2 AS g, CAST(NULL AS BIGINT) AS nrn, CAST(NULL AS BIGINT) AS x FROM src
)
ORDER BY k, g, nrn
"""


@register(
    "mysqlsql_json_table_nested",
    oracle=JSON_TABLE_NESTED_ORACLE,
    tags=("dialect", "json"),
)
def mysqlsql_json_table_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_TABLE with one NESTED PATH level (r8): parent column + inner
    array explode with per-parent FOR ORDINALITY; a parent whose nested
    array is empty keeps one row with NULL nested columns (MySQL outer
    semantics — the lowering's LATERAL VIEW OUTER posexplode).  The
    oracle builds the identical rowset analytically."""
    eng = _engine(spark, sf_dir)
    return eng.sql(
        "WITH src AS (SELECT n_nationkey AS k, "
        "CONCAT('{\"gs\":[{\"g\":1,\"xs\":[', n_nationkey, ',', "
        "n_nationkey + 10, ']},{\"g\":2,\"xs\":[]}]}') AS j FROM nation) "
        "SELECT s.k, jt.g, jt.nrn, jt.x FROM src s, "
        "JSON_TABLE(s.j, '$.gs[*]' COLUMNS ("
        "g INT PATH '$.g', "
        "NESTED PATH '$.xs[*]' COLUMNS ("
        "nrn FOR ORDINALITY, x BIGINT PATH '$'))) AS jt "
        "ORDER BY s.k, jt.g, jt.nrn"
    )


# GROUP BY ... WITH ROLLUP — executed extension (the reference grammar
# shows the MySQL form only in a comment, parser/parser.y:13846, with no
# production; same posture as GROUPING SETS).  Lowered by
# sqlshim/translate.py::_with_rollup to standard GROUP BY ROLLUP(...),
# which Catalyst expands to one Expand + single hash aggregate.

WITH_ROLLUP_ORACLE = """
SELECT o_orderstatus AS st, o_orderpriority AS pri,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY st NULLS LAST, pri NULLS LAST
"""


@register(
    "mysqlsql_with_rollup", oracle=WITH_ROLLUP_ORACLE, tags=("dialect", "agg")
)
def mysqlsql_with_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL WITH ROLLUP over two grouping columns: per-pair rows,
    per-status subtotals, and the grand total, with money summed in
    integer cents so the rollup totals are bit-exact."""
    eng = _engine(spark, sf_dir)
    return eng.sql(
        "SELECT o_orderstatus AS st, o_orderpriority AS pri, "
        "COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) "
        "AS BIGINT) AS cents "
        "FROM orders "
        "GROUP BY o_orderstatus, o_orderpriority WITH ROLLUP "
        "ORDER BY st NULLS LAST, pri NULLS LAST"
    )


# MATCH ... AGAINST — executed extension (the reference parses
# ast.MatchAgainst, parser/parser.y:5182 / parser/ast/dml.go:3461, but no
# planner rule consumes it; plans over it fail).  Lowered by
# sqlshim/fulltext.py to word-boundary RLIKE expressions — codegen regex
# scan, no shuffle until the final TakeOrderedAndProject top-k, so the
# predicate is embarrassingly parallel at any scale.

FULLTEXT_ORACLE = r"""
WITH scored AS (
  SELECT doc_id,
    CASE WHEN regexp_matches(text, '(?i)\bspark\b')
          AND NOT regexp_matches(text, '(?i)\bbatch\b')
      THEN CAST((CASE WHEN regexp_matches(text, '(?i)\bspark\b')
                 THEN 1 ELSE 0 END)
              + (CASE WHEN regexp_matches(text, '(?i)\bwindow\w*')
                 THEN 1 ELSE 0 END) AS DOUBLE)
      ELSE 0.0 END AS rel,
    CAST((CASE WHEN regexp_matches(text, '(?i)\bspark\b')
          THEN 1 ELSE 0 END)
       + (CASE WHEN regexp_matches(text, '(?i)\bjoin\b')
          THEN 1 ELSE 0 END) AS DOUBLE) AS rel_nl
  FROM documents WHERE doc_id % 7 = 0)
SELECT doc_id, rel, rel_nl FROM scored WHERE rel > 0
ORDER BY rel DESC, doc_id LIMIT 100
"""


@register(
    "mysqlsql_fulltext_match",
    oracle=FULLTEXT_ORACLE,
    tags=("dialect", "text"),
)
def mysqlsql_fulltext_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text retrieval through the MySQL predicate surface: boolean
    mode (+required / -prohibited / prefix wildcard) filters and ranks,
    natural-language mode scores alongside; the oracle mirrors the
    word-boundary regex semantics in DuckDB's RE2."""
    eng = _engine(spark, sf_dir)
    return eng.sql(
        "SELECT doc_id, "
        "MATCH(text) AGAINST('+spark -batch window*' IN BOOLEAN MODE) AS rel, "
        "MATCH(text) AGAINST('spark join') AS rel_nl "
        "FROM documents "
        "WHERE MATCH(text) AGAINST('+spark -batch window*' IN BOOLEAN MODE) "
        "AND doc_id % 7 = 0 "
        "ORDER BY rel DESC, doc_id LIMIT 100"
    )


# WITH RECURSIVE ... UNION (distinct) — Spark rejects the distinct form
# natively; the engine lowers it to the fixpoint round driver
# (engine._run_recursive_cte → operators/cte.py), the same hashtable-dedup
# semantics as the reference's executor/cte.go.  DuckDB executes the
# identical statement natively, so the oracle IS the query text.

RECURSIVE_UNION_SQL = """
WITH RECURSIVE walk(k) AS (
  SELECT CAST(0 AS BIGINT) AS k
  UNION
  SELECT CAST((w.k * w.k + 1) % 25 AS BIGINT) FROM walk w
)
SELECT w.k, n.n_name FROM walk w
JOIN nation n ON n.n_nationkey = w.k
ORDER BY w.k
"""


@register(
    "mysqlsql_recursive_union",
    oracle=RECURSIVE_UNION_SQL,
    tags=("dialect", "cte"),
)
def mysqlsql_recursive_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cyclic walk k -> (k*k+1) mod 25 (orbit 0,1,2,5,1,... ) as a UNION-DISTINCT
    recursive CTE: only dedup terminates it (UNION ALL would loop
    forever), pinning the fixpoint runner's distinct semantics through
    the SQL surface; the oracle runs the very same statement on DuckDB's
    native recursion."""
    eng = _engine(spark, sf_dir)
    return eng.sql(RECURSIVE_UNION_SQL)


# Weighted boolean fulltext (r8 executed extension): > doubles, < halves,
# ~ flips to -0.5x, () groups distribute multiplicatively, and relevance
# floors at 0 after gating.  MySQL documents only the DIRECTION of these
# operators (the InnoDB factors are internal); the x2/x0.5/x-0.5 model is
# this engine's documented choice, and the oracle pins exactly that
# arithmetic in DuckDB.  The whole predicate is codegen'd RLIKE+CASE
# column math - embarrassingly parallel at any scale.

_FTB = {
    "spark": r"(?i)\bspark\b",
    "window": r"(?i)\bwindow\w*",
    "join": r"(?i)\bjoin\b",
    "batch": r"(?i)\bbatch\b",
    "stream": r"(?i)\bstream\b",
    "shuffle": r"(?i)\bshuffle\b",
}

FULLTEXT_BOOLEAN_ORACLE = rf"""
WITH scored AS (
  SELECT doc_id,
    CASE WHEN regexp_matches(text, '{_FTB["spark"]}')
      THEN GREATEST(
          (CASE WHEN regexp_matches(text, '{_FTB["spark"]}') THEN 1 ELSE 0 END) * 1.0
        + (CASE WHEN regexp_matches(text, '{_FTB["window"]}') THEN 1 ELSE 0 END) * 2.0
        + (CASE WHEN regexp_matches(text, '{_FTB["join"]}') THEN 1 ELSE 0 END) * 0.5
        + (CASE WHEN regexp_matches(text, '{_FTB["batch"]}') THEN 1 ELSE 0 END) * -0.5
        + (CASE WHEN regexp_matches(text, '{_FTB["stream"]}') THEN 1 ELSE 0 END) * 1.0
        + (CASE WHEN regexp_matches(text, '{_FTB["shuffle"]}') THEN 1 ELSE 0 END) * 1.0,
        0.0)
      ELSE 0.0 END AS rel
  FROM documents WHERE doc_id % 3 = 0)
SELECT doc_id, rel FROM scored WHERE rel > 0
ORDER BY rel DESC, doc_id LIMIT 100
"""


@register(
    "mysqlsql_fulltext_boolean",
    oracle=FULLTEXT_BOOLEAN_ORACLE,
    tags=("dialect", "text"),
)
def mysqlsql_fulltext_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-mode weighting operators through the MySQL surface:
    '+spark >window* <join ~batch stream shuffle' ranks windowed spark
    docs up, joins mildly up, batch-mentions down - the oracle mirrors
    the documented x2/x0.5/x-0.5 factors and the 0-floor in DuckDB."""
    eng = _engine(spark, sf_dir)
    return eng.sql(
        "SELECT doc_id, "
        "MATCH(text) AGAINST('+spark >window* <join ~batch stream shuffle' "
        "IN BOOLEAN MODE) AS rel "
        "FROM documents "
        "WHERE MATCH(text) AGAINST('+spark >window* <join ~batch stream shuffle' "
        "IN BOOLEAN MODE) "
        "AND doc_id % 3 = 0 "
        "ORDER BY rel DESC, doc_id LIMIT 100"
    )


# WITH QUERY EXPANSION (r8): blind relevance feedback, two passes.  The
# engine's documented algorithm (engine._expand_fulltext_query): top-20
# first-pass rows by (natural-language score DESC, document text), then
# the 10 highest-document-frequency [a-z]{4,} tokens of those rows
# (original terms excluded, ties alphabetical) join the second-pass
# natural-language query.  The oracle REPLAYS the whole two-pass
# algorithm in DuckDB SQL - top-20 CTE, token df CTE, top-10 expansion
# CTE, correlated second-pass scoring - so term selection AND final
# scores must agree bit-for-bit.

FULLTEXT_QEXP_ORACLE = r"""
WITH seed AS (
  SELECT text,
    (CASE WHEN regexp_matches(text, '(?i)\bspark\b') THEN 1 ELSE 0 END
   + CASE WHEN regexp_matches(text, '(?i)\bvector\b') THEN 1 ELSE 0 END) AS rel
  FROM documents),
top20 AS (
  SELECT text FROM seed WHERE rel > 0 ORDER BY rel DESC, text LIMIT 20),
tok AS (
  SELECT DISTINCT text, tk
  FROM top20, UNNEST(regexp_extract_all(lower(text), '[a-z]{4,}')) AS u(tk)),
tf AS (
  SELECT tk, COUNT(*) AS c FROM tok
  WHERE tk NOT IN ('spark', 'vector') GROUP BY tk),
expn AS (
  SELECT tk FROM tf ORDER BY c DESC, tk LIMIT 10)
SELECT d.doc_id,
  CAST((CASE WHEN regexp_matches(d.text, '(?i)\bspark\b') THEN 1 ELSE 0 END)
     + (CASE WHEN regexp_matches(d.text, '(?i)\bvector\b') THEN 1 ELSE 0 END)
     + (SELECT COUNT(*) FROM expn e
        WHERE regexp_matches(d.text, '(?i)\b' || e.tk || '\b'))
    AS DOUBLE) AS rel
FROM documents d
WHERE doc_id % 4 = 0 AND (CASE WHEN regexp_matches(d.text, '(?i)\bspark\b') THEN 1 ELSE 0 END)
     + (CASE WHEN regexp_matches(d.text, '(?i)\bvector\b') THEN 1 ELSE 0 END)
     + (SELECT COUNT(*) FROM expn e
        WHERE regexp_matches(d.text, '(?i)\b' || e.tk || '\b')) > 0
ORDER BY rel DESC, d.doc_id LIMIT 100
"""


@register(
    "mysqlsql_fulltext_qexp",
    oracle=FULLTEXT_QEXP_ORACLE,
    tags=("dialect", "text"),
)
def mysqlsql_fulltext_qexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH QUERY EXPANSION through the MySQL surface: the engine's
    two-pass blind-feedback rewrite (top-20 seed rows -> top-10 df
    tokens -> expanded natural-language rescore); the oracle replays
    the identical algorithm as DuckDB CTEs, pinning both the expansion
    term selection and the final relevance values."""
    eng = _engine(spark, sf_dir)
    return eng.sql(
        "SELECT doc_id, "
        "MATCH(text) AGAINST('spark vector' WITH QUERY EXPANSION) AS rel "
        "FROM documents "
        "WHERE MATCH(text) AGAINST('spark vector' WITH QUERY EXPANSION) "
        "AND doc_id % 4 = 0 "
        "ORDER BY rel DESC, doc_id LIMIT 100"
    )


# Plan cache through the prepared-statement surface (r8;
# planner/core/plan_cache.go GetPlanFromPlanCache re-expressed as a
# lowered-text cache — see engine._PREPARE_RE note).  The query PREPAREs
# once, EXECUTEs twice with different parameters, asserts the second run
# came from the cache (@@last_plan_from_cache, the reference's own
# observability var), and returns the second result — so the driver gate
# proves CACHED-PATH results match plain SQL, not just the slow path.

PLAN_CACHE_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n, SUM(o_totalprice) AS total
FROM orders
WHERE o_custkey < 500 AND o_orderdate >= DATE '1995-01-01'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
LIMIT 3 OFFSET 1
"""


@register("mysqlsql_plan_cache", oracle=PLAN_CACHE_ORACLE, tags=("dialect",))
def mysqlsql_plan_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREPARE/EXECUTE with the r8 plan cache: the second EXECUTE binds
    the cached lowered text (named :pN markers ride the MySQL
    ``LIMIT ?, ?`` -> ``LIMIT ? OFFSET ?`` reorder), Catalyst still plans
    per execution.  The returned frame is the CACHED second execution."""
    eng = _engine(spark, sf_dir)
    eng.sql(
        "PREPARE pcq FROM 'SELECT o_orderpriority, COUNT(*) AS n, "
        "SUM(o_totalprice) AS total FROM orders "
        "WHERE o_custkey < ? AND o_orderdate >= ? "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority LIMIT ?, ?'"
    )
    eng.sql("SET @ck = 100")
    eng.sql("SET @d = '1994-01-01'")
    eng.sql("SET @off = 0")
    eng.sql("SET @cnt = 5")
    eng.sql("EXECUTE pcq USING @ck, @d, @off, @cnt").collect()
    eng.sql("SET @ck = 500")
    eng.sql("SET @d = '1995-01-01'")
    eng.sql("SET @off = 1")
    eng.sql("SET @cnt = 3")
    out = eng.sql("EXECUTE pcq USING @ck, @d, @off, @cnt")
    from_cache = (
        eng.sql("SELECT @@last_plan_from_cache AS c").collect()[0].c
    )
    if int(from_cache) != 1:
        raise AssertionError(
            "plan cache: second EXECUTE did not come from the cache"
        )
    return out
