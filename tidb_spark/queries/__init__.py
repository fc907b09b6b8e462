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
    # --- round 11 window (50 slots the driver verifies) ---
    # Built by replaying CORRECTNESS_r0{1..10}.json: all 39 rows whose
    # latest green check is r7 (the stalest tier — after this rotation
    # no query's latest check predates r8), then the 4 queries whose
    # implementation modules changed this round (the k-means update
    # dispatch + ivf salt, and the LSH blocked-verify sizing), then the
    # 7 stalest r8 rows in registry order.
    # --- the 39 r7-latest rows (stalest tier) ---
    "ts_sessionize",
    "ts_rollup_gapfill",
    "agg_mode",
    "join_skew_salted",
    "ts_ewma",
    "ts_funnel",
    "ts_retention_cohort",
    "window_exclude_current",
    "subq_quantified",
    "graph_triangles",
    "text_pii_scrub",
    "text_tfidf_topterms",
    "text_chunking",
    "data_mixture",
    "dedup_containment",
    "text_unigram_rarity",
    "dedup_substring",
    "text_bm25_topk",
    "dedup_bloom_decontam",
    "sample_weighted",
    "dedup_url_canonical",
    "text_nb_filter",
    "sim_pq_topk",
    "dedup_edit_verify",
    "text_boilerplate_strip",
    "sample_split",
    "dedup_ensemble_cluster",
    "mysqlsql_match_1hop",
    "mysqlsql_match_multipath",
    "mysqlsql_collation_ci",
    "mysqlsql_collation_unicode",
    "mysqlsql_collation_unicode_uca",
    "mysqlsql_collation_groupby",
    "mysqlsql_window_named",
    "mysqlsql_lateral",
    "mysqlsql_with_rollup",
    "mysqlsql_recursive_union",
    "stream_cascade_rollup",
    "stream_left_outer_join",
    # --- r11 code-touched modules (kmeans.py update dispatch + ivf
    # cell salting; dedup.py blocked-verify stats sizing) — plans at
    # sf0.01 resolve to the same strategies, but the dispatch changed,
    # so re-green their queries ---
    "embedding_kmeans",
    "dedup_semantic_kmeans",
    "sim_ivf_topk",
    "dedup_minhash_lsh",
    # --- 7 stalest r8 rows (registry order) ---
    "tpch_q4",
    "tpch_q5",
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q13",
    "tpch_q19",
    # (r12 rotation plan: the remaining 41 r8-latest rows are the next
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
