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
    # --- round 7 window (50 slots the driver verifies) ---
    # Built by replaying CORRECTNESS_r0{1..6}.json: 40 never-checked
    # r7 additions, then the 9 queries whose plans r7's fixes changed
    # (engine _ci GROUP BY fold rewritten per-set-op-branch; cte replan
    # hook; MATCH splice dotted-item fix; shared canonical undirected
    # edge frame for triangles/link-prediction), then 1 of the 39 rows
    # whose latest green driver check is r4 (the stalest tier; the 38
    # bumped rows lead the r8 window — see the r8 plan note below).
    # --- new in r7 (never driver-checked) ---
    "dedup_substring",
    "text_bm25_topk",
    "dedup_bloom_decontam",
    "join_asof",
    "agg_histogram",
    "text_tfidf_topterms",
    "text_chunking",
    "data_mixture",
    "embedding_kmeans",
    "join_range",
    "ts_sessionize",
    "ts_rollup_gapfill",
    "agg_mode",
    "join_skew_salted",
    "dedup_containment",
    "text_unigram_rarity",
    "graph_common_neighbors",
    "stream_cascade_rollup",
    "dedup_semantic_kmeans",
    "ts_ewma",
    "mysqlsql_window_named",
    "mysqlsql_lateral",
    "mysqlsql_json_table",
    "mysqlsql_with_rollup",
    "mysqlsql_fulltext_match",
    "sample_weighted",
    "dedup_url_canonical",
    "stream_left_outer_join",
    "ts_funnel",
    "text_nb_filter",
    "sim_pq_topk",
    "mysqlsql_recursive_union",
    "dedup_edit_verify",
    "text_boilerplate_strip",
    "ts_retention_cohort",
    "sample_split",
    "dedup_ensemble_cluster",
    "window_exclude_current",
    "subq_quantified",
    "graph_kcore",
    # --- r7 plan changes must re-verify ---
    "mysqlsql_collation_groupby",
    "mysqlsql_collation_ci",
    "mysqlsql_collation_unicode",
    "mysqlsql_collation_unicode_uca",
    "cte_recursive",
    "mysqlsql_match_multipath",
    "mysqlsql_match_1hop",
    "dedup_minhash_lsh",
    "graph_triangles",
    # --- 1 of the 39 r4-latest rows ---
    "text_pii_scrub",
    # (r8 rotation plan: the 38 r4-latest rows bumped from this window —
    # join_inner_nonequi, join_left_outer, setop_union_distinct, setop_except, dedup_decontaminate, multimodal_frames, tpch_q4, tpch_q5, tpch_q7, tpch_q8, tpch_q10, tpch_q11, tpch_q13, window_rank_family, window_rows_frame,
    # agg_group_concat, agg_count_distinct, agg_approx_sketches,
    # mysqlsql_prepare, text_top_tokens, text_pipeline_e2e,
    # text_seq_packing, agg_grouping_sets, dedup_ngram_jaccard,
    # sample_stratified, join_cross, setop_union_all,
    # window_partition_agg, setop_intersect, window_lead_lag, distinct_op,
    # agg_var_stddev, agg_minmax_first, agg_bit_ops, tpch_q19, tpch_q20,
    # tpch_q22, join_right_outer — then the 43 r5-latest rows: tpch_q1/2/6/9/12/14-18/21,
    # subq_* ×4, func_* ×6 tail, dedup_exact/cluster, point gets,
    # text_* r5 tier, sample_diversity, window_groups_frame,
    # setop_except_all, agg_percentile/json, embedding_neardup,
    # sim_topk_quantized, multimodal_meta, mysqlsql_group_concat/
    # json_mutate.  Regenerate from the CORRECTNESS files, not this
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
