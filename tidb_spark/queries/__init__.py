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
    # --- round 8 window (50 slots the driver verifies) ---
    # Built by replaying CORRECTNESS_r0{1..7}.json: the 38 rows whose
    # latest green driver check is r4 (the stalest tier — after this
    # rotation no query's latest check predates r5), then the 2 queries
    # added after the r7 close (never driver-checked), then the 4
    # queries whose plans the post-r7 fix commits changed (LSH banding
    # rewrite, common-neighbors broadcast threshold, JSON_TABLE
    # empty/NULL-doc + string-array lowering, fulltext HAVING
    # coercion), then r8 additions / r8 plan changes as they land.
    # --- the 38 r4-latest rows (stalest tier) ---
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
    "dedup_ngram_jaccard",
    "multimodal_frames",
    "dedup_decontaminate",
    "sample_stratified",
    "text_seq_packing",
    "text_pipeline_e2e",
    "text_top_tokens",
    "mysqlsql_prepare",
    # --- added after the r7 close (never driver-checked) ---
    "mysqlsql_collation_gbk",
    "mysqlsql_json_table_nested",
    # --- post-r7 plan changes must re-verify ---
    "dedup_minhash_lsh",
    "graph_common_neighbors",
    "mysqlsql_json_table",
    "mysqlsql_fulltext_match",
    # --- r8 additions / r8 plan changes (swap in as they land) ---
    "graph_kcore",
    "mysqlsql_fulltext_boolean",
    "mysqlsql_fulltext_qexp",
    "mysqlsql_plan_cache",
    "retrieval_hybrid_rrf",
    "multimodal_jpeg_decode",
    # (text_bpe_pairs, text_lm_surprise, graph_label_propagation, and
    # graph_personalized_pagerank land just past the 50-slot window —
    # first in the r9 never-checked tier.)
    # (r9 rotation plan: the 40 r5-latest rows bumped next —
    # tpch_q1/2/6/9/12/14/15/16/17/18/21 (minus any verified here),
    # setop_except_all, window_groups_frame, agg_percentile/json,
    # point_get, batch_point_get, subq_scalar/correlated/exists_bool/
    # in_notin, func_* ×6, dedup_exact/cluster, embedding_neardup,
    # sim_topk_quantized, text_stats/lang_id/fingerprint/quality/
    # repetition, multimodal_meta, sample_diversity,
    # mysqlsql_group_concat/json_mutate.  Regenerate from the
    # CORRECTNESS files, not this comment.)
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
