"""Central query registry: one entry per operator/query claimed in SURVEY §2.

Each :class:`Query` bundles a Spark implementation (``(spark, sf_dir) ->
DataFrame``) with an equivalent ANSI-SQL oracle string for DuckDB (or ``None``
for ops DuckDB cannot express — the driver then records a rows-only check).

Determinism contract (so the driver's value-hash compare passes):
- money arithmetic goes through DECIMAL (exact, order-independent) and is cast
  to DOUBLE only at the end, identically on both sides;
- every computed column is aliased to the same name on both sides;
- queries that would otherwise be unordered-nondeterministic (top-k ties)
  carry explicit tie-breaking keys.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name, spark=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    _ensure_loaded()
    return dict(REGISTRY)


_LOADED = False

# The driver's correctness gate verifies the FIRST 50 registered queries in
# registration order.  Round 1 burned all 50 slots on TPC-H + relational
# (import order), leaving graph/dedup/similarity/text/streaming/subquery/
# scalar functions driver-unverified.  This curated window interleaves one+
# representative per SURVEY §2 family so every family gets driver rows;
# everything not listed keeps its natural (import) order after slot 50.
_PRIORITY_WINDOW: tuple[str, ...] = (
    # --- round 12 window (50 slots the driver verifies) ---
    # Built by replaying CORRECTNESS_r0{1..11}.json: all 41 rows whose
    # latest green check is r8 (the stalest tier — after this rotation
    # no query's latest check predates r9), then the 9 stalest
    # r9-latest rows in registry order.  Post-r11 staleness histogram
    # was r8:41, r9:49, r10:47, r11:50.
    # --- the 41 r8-latest rows (stalest tier) ---
    "tpch_q22",
    "tpch_q11",
    "tpch_q20",
    "join_inner_nonequi",
    "join_left_outer",
    "join_right_outer",
    "join_cross",
    "setop_union_distinct",
    "setop_union_all",
    "setop_intersect",
    "setop_except",
    "window_rank_family",
    "window_lead_lag",
    "window_rows_frame",
    "window_partition_agg",
    "distinct_op",
    "agg_group_concat",
    "agg_bit_ops",
    "agg_var_stddev",
    "agg_count_distinct",
    "agg_minmax_first",
    "agg_approx_sketches",
    "agg_grouping_sets",
    "graph_common_neighbors",
    "graph_kcore",
    "dedup_ngram_jaccard",
    "multimodal_frames",
    "dedup_decontaminate",
    "sample_stratified",
    "text_seq_packing",
    "text_pipeline_e2e",
    "text_top_tokens",
    "retrieval_hybrid_rrf",
    "multimodal_jpeg_decode",
    "mysqlsql_prepare",
    "mysqlsql_collation_gbk",
    "mysqlsql_json_table",
    "mysqlsql_json_table_nested",
    "mysqlsql_fulltext_match",
    "mysqlsql_fulltext_boolean",
    "mysqlsql_plan_cache",
    # --- 9 stalest r9-latest rows (registry order) ---
    "tpch_q1",
    "tpch_q6",
    "tpch_q9",
    "tpch_q14",
    "tpch_q18",
    "tpch_q12",
    "tpch_q15",
    "tpch_q17",
    "tpch_q21",
    # (r13 rotation plan: the remaining 40 r9-latest rows are the next
    # stalest tier.  Regenerate from the CORRECTNESS files, not this
    # comment.)
)


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import for registration side effects.
    from tidb_spark.queries import (  # noqa: F401
        tpch,
        relational,
        scalar,
        graphq,
        dataops,
        dialectq,
        streamq,
    )

    # Reorder: curated window first (driver verifies the first 50), then the
    # remainder in import order.
    ordered: dict[str, Query] = {}
    for name in _PRIORITY_WINDOW:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    REGISTRY.clear()
    REGISTRY.update(ordered)

    _LOADED = True
