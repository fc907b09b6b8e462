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
    # --- round 4: ALL 34 queries whose latest driver check is round 1 ---
    # (rotation policy: staleness table in COVERAGE.md; agg_approx_sketches
    # is the priority case — its accuracy-contract oracle has never been
    # seen by the driver, only r1's no_oracle row.)
    "agg_approx_sketches",
    "agg_bit_ops",
    "agg_count_distinct",
    "agg_group_concat",
    "agg_minmax_first",
    "agg_var_stddev",
    "distinct_op",
    "join_cross",
    "join_inner_nonequi",
    "join_left_outer",
    "join_right_outer",
    "setop_except",
    "setop_intersect",
    "setop_union_all",
    "setop_union_distinct",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q11",
    "tpch_q13",
    "tpch_q19",
    "tpch_q20",
    "tpch_q22",
    "window_lead_lag",
    "window_partition_agg",
    "window_rank_family",
    "window_rows_frame",
    # --- round-4 plan changes (spread_small / winnowing rewrite / numpy
    #     PNG defilter) must re-verify ---
    "text_winnowing",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "multimodal_features",
    "multimodal_frames",
    # --- round-4 new surface (never driver-checked) ---
    "mysqlsql_prepare",
    "mysqlsql_collation_ci",
    "text_pii_scrub",
    "dedup_decontaminate",
    "sample_stratified",
    "text_seq_packing",
    "graph_any_cheapest",
    "dedup_semantic_ivf",
    "text_pipeline_e2e",
    "graph_pagerank",
    "graph_wcc",
    "graph_triangles",
    "text_top_tokens",
    "agg_grouping_sets",
    # (round-2-stale rows dedup_exact / dedup_cluster / embedding_neardup /
    # subq_*, plus unchanged r1-rows tpch_q14/q16, were displaced by new
    # surface; they lead the r5 rotation.)
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
