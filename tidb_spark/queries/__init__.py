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

    _LOADED = True
