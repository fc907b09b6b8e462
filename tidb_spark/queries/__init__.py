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
    # --- round 5: ALL 27 queries whose latest driver row is r1/r2 ---
    # (rotation policy: staleness table in COVERAGE.md; after this window
    # no query's latest driver check predates r3.)  tpch_q14-q17 lead —
    # their latest driver row is r1, the oldest in the corpus.
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "subq_scalar",
    "subq_correlated",
    "subq_exists_bool",
    "subq_in_notin",
    "dedup_exact",
    "dedup_cluster",
    "embedding_neardup",
    "sim_topk_quantized",
    "func_string",
    "func_cast",
    "func_datetime",
    "func_json",
    "agg_json",
    "multimodal_meta",
    "point_get",
    "batch_point_get",
    "tpch_q2",
    "tpch_q21",
    "mysqlsql_group_concat",
    "text_stats",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    # --- round-5 new surface (never driver-checked) ---
    "mysqlsql_json_mutate",
    "mysqlsql_match_multipath",
    "mysqlsql_collation_unicode",
    "text_repetition",
    "sample_diversity",
    "window_groups_frame",
    "setop_except_all",
    # --- round-5 plan changes must re-verify: collation shim now table-
    #     scoped + general_ci weight keys; LSH band-bucket cap; BFS
    #     anti-before-shuffle reorder; shim UDFs re-tiered to SQL/pandas.
    "mysqlsql_collation_ci",
    "dedup_minhash_lsh",
    "graph_any_shortest_len",
    "graph_any_shortest",
    "graph_all_shortest",
    "graph_top_k_shortest",
    "func_hash_inet",
    "func_mysql_shims",
    "mysqlsql_json_read",
    # --- fill: oldest r3-latest rows rotate forward ---
    "cte_recursive",
    "tpch_q1",
    "tpch_q6",
    "tpch_q9",
    "tpch_q12",
    "tpch_q18",
    "agg_percentile",
    # (r6 rotation plan: after a green r5 gate the stalest rows are the
    # r3-latest queries NOT in this window — graph_match_* ×6, stream_* ×5,
    # mysqlsql longtails, func_control/math/like_regexp, setop_intersect_all,
    # window_range_frame, sim_* ×3, limit_offset, sample_deterministic,
    # multimodal_features, text_winnowing, dedup_simhash, join_full_outer,
    # join_null_safe, agg_rollup — they lead r6, plus whatever r6 adds or re-plans.)
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
