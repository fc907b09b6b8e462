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
    # TPC-H representatives (rest were driver-green in round 1)
    "tpch_q1",       # scan + decimal-exact agg (flagship)
    "tpch_q12",      # the round-1 hash-fail — proves the oracle-typing fix
    "tpch_q21",      # semi + anti join
    "tpch_q2",       # nested correlated subquery join
    # subqueries / CTE / point access
    "subq_scalar",
    "subq_correlated",
    "subq_exists_bool",
    "subq_in_notin",
    "cte_recursive",
    "point_get",
    "batch_point_get",
    "agg_json",
    # graph (entire family)
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
    "mysqlsql_match_1hop",
    # dedup
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_cluster",  # oracle-gated transitive closure (simhash is the
    # rows-only cousin of minhash_lsh, already windowed)
    "embedding_neardup",
    # similarity / ANN
    "sim_topk_quantized",
    "sim_topk_cosine",
    "sim_lsh_topk",
    "sim_ivf_topk",
    # text analysis
    "text_stats",
    "text_lang_id",
    "text_fingerprint",
    "text_quality",
    "text_winnowing",
    # multimodal
    "multimodal_meta",
    "multimodal_frames",
    "multimodal_features",
    # streaming (entire family)
    "stream_tumbling_hour",
    "stream_sliding_1h_15m",
    "stream_session_30m",
    "stream_dedup_keys",
    "stream_interval_join",
    # scalar-function groups + MySQL dialect
    "func_string",
    "func_datetime",
    "func_json",
    "func_cast",
    "mysqlsql_group_concat",
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
