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
    # --- round 9 window (50 slots the driver verifies) ---
    # Built by replaying CORRECTNESS_r0{1..8}.json: the 4 queries that
    # have NEVER had a driver row (late-r8 additions — VERDICT r8 item
    # #1) lead, then the 40 rows whose latest green check is r5 (the
    # stalest tier — after this rotation no query's latest check
    # predates r6), then r9 additions / r9 plan changes as they land.
    # --- never driver-checked (must lead) ---
    "graph_label_propagation",
    "graph_personalized_pagerank",
    "text_bpe_pairs",
    "text_lm_surprise",
    # --- the 40 r5-latest rows (stalest tier) ---
    "tpch_q1",
    "tpch_q2",
    "tpch_q6",
    "tpch_q9",
    "tpch_q12",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q21",
    "setop_except_all",
    "window_groups_frame",
    "agg_percentile",
    "agg_json",
    "point_get",
    "batch_point_get",
    "subq_scalar",
    "subq_correlated",
    "subq_exists_bool",
    "subq_in_notin",
    "func_cast",
    "func_datetime",
    "func_hash_inet",
    "func_json",
    "func_mysql_shims",
    "func_string",
    "dedup_exact",
    "dedup_cluster",
    "embedding_neardup",
    "sim_topk_quantized",
    "text_stats",
    "text_lang_id",
    "text_fingerprint",
    "text_quality",
    "text_repetition",
    "multimodal_meta",
    "sample_diversity",
    "mysqlsql_group_concat",
    "mysqlsql_json_mutate",
    # --- r9 additions / r9 plan changes (swap in as they land; 6 slots) ---
    # (pinyin collation shipped as DDL-accept/use-reject parity — the
    # reference's collator is a panic stub with no weight data
    # (util/collate/pinyin_tidb_as_cs.go:22-34), so there are no
    # comparison semantics to oracle; pinned by pytest
    # test_collation_pinyin_ddl_accepts_use_rejects instead.)
    "dedup_minhash_lsh",  # r9 plan change: union-free Jaccard verify
    "dedup_semantic_ivf",  # r9 plan change: per-bucket int64 matmul cell
    "mysqlsql_fulltext_qexp",  # r9 semantics fix: df over DISTINCT seed docs
    "multimodal_mp4_demux",  # r9 addition: ISO-BMFF mux/demux (data/mp4.py)
    "multimodal_mpeg_scan",  # r9 addition: MPEG audio frame walk
    "multimodal_resize",  # r9 addition: decode→box-resize fusion
    # (Evicted to past-slot-50 to make room for the three NEW queries —
    # never-driver-checked rows outrank plan-change rechecks (VERDICT r8
    # item #1): sim_pq_topk (combinable-argmin), text_boilerplate_strip
    # (spread-before-explode), and graph_common_neighbors (byte-gated
    # broadcast probe — a join-STRATEGY change pinned by
    # tests/test_plans.py:537 plus the sf0.001 oracle mirror).  All
    # three have green r7/r8 driver rows and roll into the r10 window
    # with the r6 tier.)
    # (r10 rotation plan: the 44 r6-latest rows are the next stalest
    # tier — agg_rollup, cte_nonrecursive, dedup_semantic_ivf*,
    # dedup_simhash, func_control/like_regexp/math, the 13 graph_match_*/
    # shortest/pagerank/wcc rows, join_full_outer/null_safe,
    # limit_offset, multimodal_features, 7 mysqlsql longtails,
    # sample_deterministic, setop_intersect_all, sim_ivf/lsh/cosine,
    # the 5 stream_* rows, text_winnowing, tpch_q3, window_range_frame.
    # *dedup_semantic_ivf re-verifies THIS round (r9 plan change), so it
    # drops out of the r10 tier.  Regenerate from the CORRECTNESS files,
    # not this comment.)
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
