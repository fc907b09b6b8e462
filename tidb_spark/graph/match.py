"""MATCH path-pattern builder: lowers PGQL-style paths to a join chain.

This is the DataFrame analogue of ``buildGraphPathSimple``
(``planner/core/logical_plan_builder.go:6579-6708``): source table →
optional selection → chained edge expansions, each hop's WHERE applied as a
selection right after the hop.  Edge directions (``parser/ast/graph.go:76-79``):

- OUT:  expand ``frontier.id == edge.src`` → ``edge.dst``
- IN:   expand ``frontier.id == edge.dst`` → ``edge.src``
  (the reference scans the reverse GRAPH_EDGE_KEY index,
  ``executor/graph.go:184-208``; a join needs no index)
- BOTH: out-edges that have a reverse twin — the reference probes for the
  reverse edge's existence per forward edge (``executor/graph.go:234-265``);
  here a left-semi self-join of the edge table on (src=dst, dst=src).

Multiple comma-separated paths UNION ALL (``buildGraph``,
``logical_plan_builder.go:6484-6506``): use ``union_paths``.

Column naming: every vertex/edge column is exposed as ``{alias}_{col}``
(the reference exposes ``alias.col``; DataFrames flatten the dot).
Implicit destinations (no ``.vertex()`` after a hop) expose only the
destination vertex id, mirroring the hidden-column handling at
``logical_plan_builder.go:6659-6708``.

Scale: each hop is one equi-join, shuffle-partitioned on the hop key; a
small vertex/edge table is broadcast automatically by AQE.  Per-hop WHERE
filters are applied pre-join where they touch only one side (Catalyst pushes
them down), so frontier size shrinks as early as possible — the same motive
as the reference's skip-materialization flags (``executor/graph.go:127-128``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tidb_spark.graph.model import EdgeTable, GraphSchema

OUT = "OUT"
IN = "IN"
BOTH = "BOTH"


def _prefixed(df: DataFrame, alias: str) -> DataFrame:
    return df.select(
        *[F.col(c).alias(f"{alias}_{c}") for c in df.columns]
    )


def _bidirectional(edge: EdgeTable) -> DataFrame:
    """Forward edges that also exist reversed (executor/graph.go:234-265)."""
    fwd = edge.df
    rev = edge.df.select(
        F.col(edge.src_col).alias("__rev_dst"), F.col(edge.dst_col).alias("__rev_src")
    )
    return fwd.join(
        rev,
        (F.col(edge.src_col) == F.col("__rev_src"))
        & (F.col(edge.dst_col) == F.col("__rev_dst")),
        "left_semi",
    )


class PathBuilder:
    """Fluent MATCH builder; call ``.df()`` to get the lowered join chain."""

    def __init__(self, graph: GraphSchema):
        self.graph = graph
        self._df: DataFrame | None = None
        self._cur_id: str | None = None  # column holding the frontier vertex id
        self._pending_edge: tuple[EdgeTable, str, str] | None = None

    # -- vertices ----------------------------------------------------------
    def source(
        self, table: str, alias: str, where: Column | str | None = None
    ) -> "PathBuilder":
        vt = self.graph.vertex(table)
        df = _prefixed(vt.df, alias)
        if where is not None:
            df = df.where(where)
        self._df = df
        self._cur_id = f"{alias}_{vt.id_col}"
        return self

    def vertex(
        self, table: str, alias: str, where: Column | str | None = None
    ) -> "PathBuilder":
        """Explicit destination of the pending hop."""
        if self._pending_edge is None:
            raise ValueError("vertex() requires a preceding out()/in_()/both()")
        edge, edge_alias, direction = self._pending_edge
        vt = self.graph.vertex(table)
        vdf = _prefixed(vt.df, alias)
        hop_dst = (
            f"{edge_alias}_{edge.src_col}"
            if direction == IN
            else f"{edge_alias}_{edge.dst_col}"
        )
        joined = self._df.join(
            vdf, F.col(hop_dst) == F.col(f"{alias}_{vt.id_col}")
        )
        if where is not None:
            joined = joined.where(where)
        self._df = joined
        self._cur_id = f"{alias}_{vt.id_col}"
        self._pending_edge = None
        return self

    # -- edges -------------------------------------------------------------
    def _hop(
        self,
        edge_name: str,
        alias: str | None,
        direction: str,
        where: Column | str | None,
    ) -> "PathBuilder":
        if self._df is None:
            raise ValueError("source() must come first")
        if self._pending_edge is not None:
            # Previous hop had an implicit destination: continue directly from
            # the edge's destination id (hidden-column rule).
            prev_edge, prev_alias, prev_dir = self._pending_edge
            self._cur_id = (
                f"{prev_alias}_{prev_edge.src_col}"
                if prev_dir == IN
                else f"{prev_alias}_{prev_edge.dst_col}"
            )
            self._pending_edge = None
        edge = self.graph.edge(edge_name)
        alias = alias or edge_name
        edf = edge.df if direction != BOTH else _bidirectional(edge)
        edf = _prefixed(edf, alias)
        hop_src = (
            f"{alias}_{edge.dst_col}" if direction == IN else f"{alias}_{edge.src_col}"
        )
        joined = self._df.join(edf, F.col(self._cur_id) == F.col(hop_src))
        if where is not None:
            joined = joined.where(where)
        self._df = joined
        self._pending_edge = (edge, alias, direction)
        return self

    def out(self, edge: str, alias: str | None = None, where=None) -> "PathBuilder":
        return self._hop(edge, alias, OUT, where)

    def in_(self, edge: str, alias: str | None = None, where=None) -> "PathBuilder":
        return self._hop(edge, alias, IN, where)

    def both(self, edge: str, alias: str | None = None, where=None) -> "PathBuilder":
        return self._hop(edge, alias, BOTH, where)

    # -- terminal ----------------------------------------------------------
    def df(self) -> DataFrame:
        if self._df is None:
            raise ValueError("empty path")
        return self._df


def match(graph: GraphSchema) -> PathBuilder:
    return PathBuilder(graph)


def union_paths(*paths: PathBuilder) -> DataFrame:
    """Comma-separated MATCH paths → UNION ALL (buildGraph,
    logical_plan_builder.go:6484-6506).  Paths must be column-compatible."""
    dfs = [p.df() for p in paths]
    out = dfs[0]
    for other in dfs[1:]:
        out = out.unionByName(other)
    return out
