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
    # --- round 10 window (50 slots the driver verifies) ---
    # Built by replaying CORRECTNESS_r0{1..9}.json: the one never-
    # driver-checked query (the r10 addition dedup_lsh_verified) leads,
    # then the 43 rows whose latest green check is r6 (the stalest tier
    # — after this rotation no query's latest check predates r7), then
    # the two queries whose physical plan changed this round (the
    # k-means two-level pruned assign), then the 4 stalest r7 rows.
    # --- never driver-checked (must lead) ---
    "dedup_lsh_verified",  # r10 addition: LSH-prefilter + exact verify
    # --- the 43 r6-latest rows (stalest tier) ---
    "tpch_q3",
    "join_full_outer",
    "join_null_safe",
    "setop_intersect_all",
    "window_range_frame",
    "limit_offset",
    "sample_deterministic",
    "agg_rollup",
    "cte_nonrecursive",
    "func_math",
    "func_control",
    "func_like_regexp",
    "graph_match_out",
    "graph_match_in",
    "graph_match_both",
    "graph_match_2hop",
    "graph_match_multipath",
    "graph_match_edge_props",
    "graph_any_shortest",
    "graph_any_shortest_len",
    "graph_all_shortest",
    "graph_top_k_shortest",
    "graph_any_cheapest",
    "graph_pagerank",
    "graph_wcc",
    "dedup_simhash",
    "sim_topk_cosine",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "text_winnowing",
    "multimodal_features",
    "mysqlsql_date_funcs",
    "mysqlsql_string_misc",
    "mysqlsql_json_read",
    "mysqlsql_datetime_longtail",
    "mysqlsql_string_longtail",
    "mysqlsql_hint_join",
    "mysqlsql_view_join",
    "stream_tumbling_hour",
    "stream_sliding_1h_15m",
    "stream_session_30m",
    "stream_dedup_keys",
    "stream_interval_join",
    # --- r10 plan changes (k-means assign dispatch; flat at sf0.01 but
    # the dispatch + callers changed, so re-green them) ---
    "dedup_semantic_kmeans",
    "embedding_kmeans",
    # --- 4 stalest r7 rows (registry order) ---
    "cte_recursive",
    "join_asof",
    "agg_histogram",
    "join_range",
    # (r11 rotation plan: the remaining 41 r7-latest rows are the next
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
