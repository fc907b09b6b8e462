"""Catalog: bind the TESTDATA parquet tables (and derived graph views).

The reference keeps a versioned in-memory schema catalog (``infoschema/``)
over a KV store; our OLAP-scope equivalent is a dictionary of DataFrames over
columnar parquet (SURVEY.md §1.1/§1.3).  Graph fixtures follow the
reference's vertex/edge conventions (``ddl/ddl_api.go:1946-2025``: an edge
table declares SOURCE KEY / DESTINATION KEY columns referencing vertex-table
integer primary keys) and are derived deterministically from the star schema
as documented in FIXTURES.md.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Vertex ids must be disjoint across vertex tables because the reference
# addresses vertices by bare int64 handle (FIXTURES.md).
ORDER_VERTEX_OFFSET = 10_000_000


# (applicationId, sf_dir, table) -> DataFrame.  spark.read.parquet does
# driver-side file listing + footer schema reads (~0.1 s per call); the
# reference's answer is its in-memory infoschema catalog — ours is this
# handle cache.  DataFrames are immutable lazy plans, so reuse is safe;
# the applicationId key drops entries when a SparkContext is restarted.
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    hit = _TABLE_CACHE.get(key)
    if hit is None:
        hit = _TABLE_CACHE[key] = _load_table(spark, sf_dir, name)
    return hit


def _load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read the raw int64 and truncate to micros — the
        # same precision DuckDB's TIMESTAMP (us) lands on, so oracle
        # comparisons agree.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Keep batch/stream type parity: events_stream casts to
            # TIMESTAMP (watermarks require it); mirror here so unions /
            # comparisons across the two paths see one ts type.  UTC session
            # (session.py) makes the cast wall-clock identity.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def graph_views(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Derived vertex/edge DataFrames (FIXTURES.md 'Graph fixtures').

    v_customer: vertex id c_custkey.  v_order: vertex id o_orderkey+offset.
    e_ordered:  customer -[ordered]-> order.
    e_knows:    deterministic customer-customer graph via adjacent orderkeys.
    """
    orders = tables["orders"]
    v_customer = tables["customer"]
    v_order = orders.select(
        (F.col("o_orderkey") + F.lit(ORDER_VERTEX_OFFSET)).alias("id"),
        F.col("o_orderstatus"),
    )
    e_ordered = orders.select(
        F.col("o_custkey").alias("src"),
        (F.col("o_orderkey") + F.lit(ORDER_VERTEX_OFFSET)).alias("dst"),
        F.col("o_orderdate"),
        F.col("o_totalprice"),
    )
    a = orders.select(
        F.col("o_custkey").alias("src"), F.col("o_orderkey").alias("k")
    )
    b = orders.select(
        F.col("o_custkey").alias("dst"), (F.col("o_orderkey") - 1).alias("k")
    )
    e_knows = (
        a.join(b, "k")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )
    return {
        "v_customer": v_customer,
        "v_order": v_order,
        "e_ordered": e_ordered,
        "e_knows": e_knows,
    }


# The same derived views, as ANSI-SQL CTE bodies for the DuckDB oracle.
GRAPH_VIEW_SQL: dict[str, str] = {
    "v_customer": "SELECT * FROM customer",
    "v_order": (
        "SELECT o_orderkey + 10000000 AS id, o_orderstatus FROM orders"
    ),
    "e_ordered": (
        "SELECT o_custkey AS src, o_orderkey + 10000000 AS dst,"
        " o_orderdate, o_totalprice FROM orders"
    ),
    "e_knows": (
        "SELECT a.o_custkey AS src, b.o_custkey AS dst"
        " FROM orders a JOIN orders b ON a.o_orderkey = b.o_orderkey - 1"
        " WHERE a.o_custkey <> b.o_custkey"
    ),
}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every base table and graph view as a temp view."""
    tables = load_all(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    gviews = graph_views(tables)
    for name, df in gviews.items():
        df.createOrReplaceTempView(name)
    tables.update(gviews)
    return tables
