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
    # --- round 6: ALL 32 queries whose latest driver row is r3 ---
    # (rotation policy: staleness recomputed by replaying every
    # CORRECTNESS_r0*.json, not from hand-kept comments; after this window
    # no query's latest driver check predates r4.)
    "graph_match_out",
    "graph_match_in",
    "graph_match_both",
    "graph_match_2hop",
    "graph_match_edge_props",
    "graph_match_multipath",
    "stream_tumbling_hour",
    "stream_sliding_1h_15m",
    "stream_session_30m",
    "stream_dedup_keys",
    "stream_interval_join",
    "mysqlsql_date_funcs",
    "mysqlsql_datetime_longtail",
    "mysqlsql_string_longtail",
    "mysqlsql_string_misc",
    "mysqlsql_hint_join",
    "mysqlsql_view_join",
    "mysqlsql_match_1hop",
    "func_control",
    "func_math",
    "func_like_regexp",
    "sim_topk_cosine",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "cte_nonrecursive",
    "agg_rollup",
    "join_full_outer",
    "join_null_safe",
    "limit_offset",
    "sample_deterministic",
    "setop_intersect_all",
    "window_range_frame",
    # --- round-6 new surface (never driver-checked) ---
    "mysqlsql_collation_unicode_uca",
    "mysqlsql_collation_groupby",
    # --- round-6 plan changes must re-verify: collation shim rewritten
    #     (per-collation dispatch, block scoping, GROUP BY fold, LIKE NO
    #     PAD); json_unquote strict gate; BFS rounds pipelined (count job
    #     overlaps next-round planning) + session table/graph caches.
    "mysqlsql_collation_ci",
    "mysqlsql_collation_unicode",
    "mysqlsql_json_read",
    "graph_any_shortest_len",
    "graph_any_shortest",
    "graph_all_shortest",
    "graph_top_k_shortest",
    "graph_any_cheapest",
    # --- fill: oldest r4-latest rows rotate forward (graph analytics
    #     first — graphq.py's schema cache touched their build path) ---
    "graph_pagerank",
    "graph_wcc",
    "graph_triangles",
    "dedup_simhash",
    "dedup_semantic_ivf",
    "multimodal_features",
    "text_winnowing",
    "tpch_q3",
    # (r7 rotation plan: the remaining 40 r4-latest rows — tpch_q4/5/7/8/
    # 10/11/13/19/20/22, agg_* ×7, join_* ×4, setop_* ×4, window_* ×4,
    # text_* ×4, dedup_ngram_jaccard/decontaminate, multimodal_frames,
    # sample_stratified, distinct_op, mysqlsql_prepare — lead r7, plus
    # whatever r7 adds or re-plans.  Regenerate from the CORRECTNESS
    # files, not this comment.)
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
