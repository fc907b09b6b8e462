"""Scalar-function coverage (SURVEY §2.10): string, math, date/time, control
flow, JSON, LIKE/regexp, hashing, and the MySQL-gap shims from
``tidb_spark.functions.mysql``.

Each query exercises a function family over fixture columns with a DuckDB
oracle.  Cross-engine hazards intentionally avoided: libm-dependent
transcendentals are pinned to exactly-representable results, double→string
formatting is avoided, and DuckDB's round-on-int-cast (vs Spark's truncate)
is never relied on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_spark.catalog import load_table
from tidb_spark.functions import mysql as my
from tidb_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


FUNC_STRING_ORACLE = """
SELECT c_custkey,
       UPPER(c_name)                    AS up,
       LOWER(c_mktsegment)              AS lo,
       LENGTH(c_name)                   AS len,
       SUBSTR(c_name, 1, 8)             AS sub,
       REPLACE(c_name, '#', '-')        AS repl,
       LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
       REVERSE(c_mktsegment)            AS rev,
       CONCAT_WS('|', c_name, c_mktsegment) AS joined,
       LEFT(c_name, 4)                  AS l4,
       RIGHT(c_name, 3)                 AS r3,
       REPEAT('ab', 3)                  AS rep,
       TRIM('  pad  ')                  AS trimmed,
       STRPOS(c_name, '#')              AS hash_pos
FROM customer
WHERE c_custkey < 100
ORDER BY c_custkey
"""


@register("func_string", oracle=FUNC_STRING_ORACLE, tags=("scalar", "string"))
def func_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String builtins (builtin_string.go): UPPER/LOWER/LENGTH/SUBSTR/
    REPLACE/LPAD/REVERSE/CONCAT_WS/LEFT/RIGHT/REPEAT/TRIM/INSTR."""
    customer = _t(spark, sf_dir, "customer").where(F.col("c_custkey") < 100)
    return customer.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.length("c_name").cast("long").alias("len"),
        F.substring("c_name", 1, 8).alias("sub"),
        F.regexp_replace("c_name", "#", "-").alias("repl"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.reverse("c_mktsegment").alias("rev"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.substring("c_name", 1, 4).alias("l4"),
        F.expr("RIGHT(c_name, 3)").alias("r3"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.instr("c_name", "#").cast("long").alias("hash_pos"),
    ).orderBy("c_custkey")


FUNC_MYSQL_SHIMS_ORACLE = """
SELECT o_orderkey,
       CASE ((o_orderkey % 3) + 1)
         WHEN 1 THEN 'one' WHEN 2 THEN 'two' WHEN 3 THEN 'three' END AS elt_val,
       CASE o_orderstatus
         WHEN 'O' THEN 1 WHEN 'F' THEN 2 WHEN 'P' THEN 3 ELSE 0 END AS field_val,
       COALESCE(ARRAY_TO_STRING(
         LIST_FILTER([CASE WHEN (o_orderkey % 8) & 1 = 1 THEN 'a' END,
                      CASE WHEN (o_orderkey % 8) & 2 = 2 THEN 'b' END,
                      CASE WHEN (o_orderkey % 8) & 4 = 4 THEN 'c' END],
                     x -> x IS NOT NULL),
         ','), '') AS makeset_val,
       SPLIT_PART(o_orderpriority, '-', 1) AS prio_num,
       CASE WHEN o_orderstatus = 'O' THEN 'open' ELSE 'closed' END AS if_val,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS ifnull_val,
       o_orderkey // 7 AS div_val
FROM orders
WHERE o_orderkey < 300
ORDER BY o_orderkey
"""


@register("func_mysql_shims", oracle=FUNC_MYSQL_SHIMS_ORACLE, tags=("scalar", "mysql"))
def func_mysql_shims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL gap-list shims: ELT, FIELD, MAKE_SET, SUBSTRING_INDEX, IF,
    IFNULL, DIV — all composed from JVM built-ins (no Python UDFs)."""
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 300)
    return orders.select(
        "o_orderkey",
        my.elt((F.col("o_orderkey") % 3 + 1), "one", "two", "three").alias("elt_val"),
        my.field("o_orderstatus", "O", "F", "P").alias("field_val"),
        my.make_set(F.col("o_orderkey") % 8, "a", "b", "c").alias("makeset_val"),
        F.substring_index("o_orderpriority", "-", 1).alias("prio_num"),
        my.if_(F.col("o_orderstatus") == "O", F.lit("open"), F.lit("closed")).alias(
            "if_val"
        ),
        my.ifnull(F.nullif(F.col("o_orderstatus"), F.lit("P")), "pending").alias(
            "ifnull_val"
        ),
        my.div("o_orderkey", F.lit(7)).alias("div_val"),
    ).orderBy("o_orderkey")


FUNC_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       ABS(l_quantity - 25)                    AS abs_v,
       CAST(FLOOR(l_extendedprice) AS BIGINT)  AS floor_v,
       CAST(CEIL(l_extendedprice)  AS BIGINT)  AS ceil_v,
       CAST(SIGN(l_quantity - 25) AS DOUBLE)   AS sign_v,
       l_orderkey % 97                         AS mod_v,
       CAST(POWER(2, l_linenumber) AS DOUBLE)  AS pow_v,
       SQRT(CAST(l_quantity * l_quantity AS DOUBLE)) AS sqrt_v,
       GREATEST(l_quantity, 25.0)              AS greatest_v,
       LEAST(l_quantity, 25.0)                 AS least_v,
       BIT_COUNT(l_orderkey)                   AS bits_v
FROM lineitem
WHERE l_orderkey < 200
ORDER BY l_orderkey, l_linenumber
"""


@register("func_math", oracle=FUNC_MATH_ORACLE, tags=("scalar", "math"))
def func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math builtins (builtin_math.go) pinned to FP-exact cases."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("abs_v"),
        F.floor("l_extendedprice").cast("long").alias("floor_v"),
        F.ceil("l_extendedprice").cast("long").alias("ceil_v"),
        F.signum(F.col("l_quantity") - 25).alias("sign_v"),  # double both sides
        (F.col("l_orderkey") % 97).alias("mod_v"),
        F.pow(F.lit(2), F.col("l_linenumber")).cast("double").alias("pow_v"),
        F.sqrt((F.col("l_quantity") * F.col("l_quantity")).cast("double")).alias(
            "sqrt_v"
        ),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("greatest_v"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("least_v"),
        F.bit_count(F.col("l_orderkey")).cast("long").alias("bits_v"),
    ).orderBy("l_orderkey", "l_linenumber")


FUNC_DATETIME_ORACLE = """
SELECT o_orderkey,
       CAST(EXTRACT(YEAR  FROM o_orderdate) AS BIGINT) AS y,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
       CAST(EXTRACT(DAY   FROM o_orderdate) AS BIGINT) AS d,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS q,
       DATE_TRUNC('month', o_orderdate)     AS month_start,
       o_orderdate + INTERVAL 30 DAY        AS plus30,
       CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT)
         AS days_since,
       CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(EPOCH(o_orderdate) AS BIGINT)   AS unix_ts,
       STRFTIME(o_orderdate, '%Y-%m-%d')    AS formatted
FROM orders
WHERE o_orderkey < 200
ORDER BY o_orderkey
"""


@register("func_datetime", oracle=FUNC_DATETIME_ORACLE, tags=("scalar", "datetime"))
def func_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time builtins (builtin_time.go): EXTRACT family, DATE_TRUNC,
    interval arithmetic, datediff, LAST_DAY, UNIX_TIMESTAMP, and MySQL
    DATE_FORMAT '%'-patterns via the shim translator."""
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("plus30"),
        F.datediff(
            F.col("o_orderdate"), F.expr("TIMESTAMP '1995-01-01 00:00:00'")
        )
        .cast("long")
        .alias("days_since"),
        # DATE re-widened to TIMESTAMP: Spark DATE -> pandas object vs DuckDB
        # datetime64 — the driver hash is dtype-sensitive.
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.unix_timestamp("o_orderdate").cast("long").alias("unix_ts"),
        my.date_format_mysql("o_orderdate", "%Y-%m-%d").alias("formatted"),
    ).orderBy("o_orderkey")


FUNC_CONTROL_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'big'
            WHEN o_totalprice > 150000 THEN 'mid'
            ELSE 'small' END AS size_class,
       CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'done'
            ELSE 'other' END AS status_word,
       COALESCE(NULLIF(o_orderpriority, '5-LOW'), 'LOW!') AS prio,
       (o_orderstatus = 'O' AND o_totalprice > 200000) AS is_big_open,
       (o_orderstatus IN ('O','P')) OR (o_totalprice < 50000) AS in_or,
       NOT (o_orderstatus = 'F') AS not_f,
       (o_totalprice BETWEEN 100000 AND 200000) AS in_band
FROM orders
WHERE o_orderkey < 300
ORDER BY o_orderkey
"""


@register("func_control", oracle=FUNC_CONTROL_ORACLE, tags=("scalar", "control"))
def func_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE (both forms), COALESCE/NULLIF, AND/OR/NOT/IN/BETWEEN boolean ops
    (builtin_control.go, builtin_op.go, builtin_compare.go)."""
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 300)
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "done")
        .otherwise("other")
        .alias("status_word"),
        F.coalesce(F.nullif("o_orderpriority", F.lit("5-LOW")), F.lit("LOW!")).alias(
            "prio"
        ),
        ((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 200000)).alias(
            "is_big_open"
        ),
        (
            F.col("o_orderstatus").isin("O", "P") | (F.col("o_totalprice") < 50000)
        ).alias("in_or"),
        (~(F.col("o_orderstatus") == "F")).alias("not_f"),
        F.col("o_totalprice").between(100000, 200000).alias("in_band"),
    ).orderBy("o_orderkey")


FUNC_JSON_ORACLE = """
SELECT event_id,
       CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_val,
       JSON_EXTRACT_STRING(props, '$.missing') AS missing_val,
       (CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) > 50) AS k_big
FROM events
WHERE event_id < 300
ORDER BY event_id
"""


@register("func_json", oracle=FUNC_JSON_ORACLE, tags=("scalar", "json"))
def func_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON read family on events.props: JSON_EXTRACT → get_json_object
    (builtin_json.go; reference BinaryJSON, types/json/binary.go:104)."""
    events = _t(spark, sf_dir, "events").where(F.col("event_id") < 300)
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
        (F.get_json_object("props", "$.k").cast("long") > 50).alias("k_big"),
    ).orderBy("event_id")


FUNC_LIKE_REGEXP_ORACLE = """
SELECT p_partkey, p_name,
       (p_name LIKE '%bolt%')             AS has_bolt,
       (p_name LIKE 'red%')               AS red_prefix,
       (p_name LIKE '_ot%')               AS underscore_pat,
       REGEXP_MATCHES(p_name, '^(red|blue)') AS rx_color,
       REGEXP_EXTRACT(p_name, '([a-z]+)$', 1) AS last_word,
       REGEXP_REPLACE(p_name, '[aeiou]', '*', 'g') AS devoweled
FROM part
WHERE p_partkey < 300
ORDER BY p_partkey
"""


@register("func_like_regexp", oracle=FUNC_LIKE_REGEXP_ORACLE, tags=("scalar", "regexp"))
def func_like_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / REGEXP family (builtin_like.go): patterns, anchored regex,
    extraction group, global replace."""
    part = _t(spark, sf_dir, "part").where(F.col("p_partkey") < 300)
    return part.select(
        "p_partkey",
        "p_name",
        F.col("p_name").like("%bolt%").alias("has_bolt"),
        F.col("p_name").like("red%").alias("red_prefix"),
        F.col("p_name").like("_ot%").alias("underscore_pat"),
        F.col("p_name").rlike("^(red|blue)").alias("rx_color"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
    ).orderBy("p_partkey")


FUNC_HASH_INET_ORACLE = """
SELECT c_custkey,
       MD5(c_name) AS md5_name,
       SHA256(c_mktsegment) AS sha_seg,
       (c_custkey % 256) * 16777216 + 657930 AS ip_num,
       CAST(c_custkey % 256 AS VARCHAR) || '.10.10.10' AS ip_str
FROM customer
WHERE c_custkey < 100
ORDER BY c_custkey
"""


@register("func_hash_inet", oracle=FUNC_HASH_INET_ORACLE, tags=("scalar", "hash"))
def func_hash_inet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MD5/SHA2 (builtin_encryption.go) and INET_ATON/NTOA round-trip
    (builtin_miscellaneous.go) — the shims are pure column arithmetic, shown
    here producing the same number/string the oracle computes directly."""
    customer = _t(spark, sf_dir, "customer").where(F.col("c_custkey") < 100)
    ip_str = F.concat_ws(
        ".",
        (F.col("c_custkey") % 256).cast("string"),
        F.lit("10"),
        F.lit("10"),
        F.lit("10"),
    )
    return customer.select(
        "c_custkey",
        F.md5("c_name").alias("md5_name"),
        F.sha2("c_mktsegment", 256).alias("sha_seg"),
        my.inet_aton(ip_str).alias("ip_num"),
        my.inet_ntoa(my.inet_aton(ip_str)).alias("ip_str"),
    ).orderBy("c_custkey")


FUNC_CAST_ORACLE = """
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR)                  AS key_str,
       CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT)  AS key_roundtrip,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS as_date,
       CAST(o_orderkey AS SMALLINT)                 AS as_short,
       CAST(FLOOR(o_totalprice) AS BIGINT)          AS price_floor,
       CAST(o_orderstatus = 'O' AS INT)             AS bool_int
FROM orders
WHERE o_orderkey < 200
ORDER BY o_orderkey
"""


@register("func_cast", oracle=FUNC_CAST_ORACLE, tags=("scalar", "cast"))
def func_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST/CONVERT surface (builtin_cast.go) across int/string/date/bool —
    restricted to conversions where MySQL, Spark and DuckDB agree (notably
    avoiding double→int, where DuckDB rounds but Spark/MySQL truncate)."""
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    return orders.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        # DATE is re-widened to TIMESTAMP for output so both engines land in
        # pandas as datetime64[ns] (Spark DATE -> python date objects vs
        # DuckDB DATE -> datetime64: the driver hash is dtype-sensitive).
        F.col("o_orderdate").cast("date").cast("timestamp").alias("as_date"),
        F.col("o_orderkey").cast("short").alias("as_short"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        (F.col("o_orderstatus") == "O").cast("int").alias("bool_int"),
    ).orderBy("o_orderkey")
