"""tidb_spark — a PySpark-native analytics engine with the query surface of
the tigraph/tidb reference (OLAP scope + graph MATCH extension).

Architecture (SURVEY.md §7): the reference's volcano executor, coprocessor
pushdown and MPP layers are replaced wholesale by Spark SQL / Catalyst / AQE.
This package contributes the pieces Spark does not have natively:

- ``graph/``      — MATCH path-pattern lowering to join chains and an
                    iterative BFS ANY SHORTEST executor
                    (reference: ``executor/graph.go``, ``graph_shortest.go``).
- ``operators/``  — recursive-CTE fixpoint runner and other composed ops.
- ``functions/``  — MySQL-dialect scalar function shims.
- ``data/``       — training-data pipeline ops: dedup (exact/minhash/simhash),
                    embedding similarity search, text analysis, multimodal
                    column plumbing.
- ``streaming/``  — Structured-Streaming surface over the events table.
- ``queries/``    — the registered query corpus (the driver contract).
"""

from tidb_spark.session import get_spark
from tidb_spark.catalog import load_all, load_table, register_views

__all__ = ["get_spark", "load_all", "load_table", "register_views"]
