"""Graph schema registry: vertex and edge tables over DataFrames.

Reference model (SURVEY §1.4): a vertex table is any table with an int64
primary-key handle; an edge table declares exactly one ``SOURCE KEY
REFERENCES <tbl>`` and one ``DESTINATION KEY REFERENCES <tbl>`` column
(``ddl/ddl_api.go:1946-2025``, flags set at ``:2017-2018``).  The reference
synthesizes a clustered PK ``(src,dst)`` plus a reverse ``GRAPH_EDGE_KEY``
index on ``(dst,src)`` so both directions range-scan; with DataFrames both
directions are plain joins, so no reverse copy is materialized — at 100 TB
scale, bucket the edge DataFrame by ``src`` (and keep a dst-bucketed copy if
IN-expansion dominates).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class VertexTable:
    name: str
    df: DataFrame
    id_col: str


@dataclass
class EdgeTable:
    name: str
    df: DataFrame
    src_col: str
    dst_col: str
    src_table: str  # vertex table the SOURCE KEY references
    dst_table: str  # vertex table the DESTINATION KEY references


class GraphSchema:
    """Catalog of vertex/edge tables, the DDL surface of the graph layer."""

    def __init__(self) -> None:
        self.vertices: dict[str, VertexTable] = {}
        self.edges: dict[str, EdgeTable] = {}

    def add_vertex_table(self, name: str, df: DataFrame, id_col: str) -> None:
        self.vertices[name] = VertexTable(name, df, id_col)

    def add_edge_table(
        self,
        name: str,
        df: DataFrame,
        src_col: str,
        dst_col: str,
        src_table: str,
        dst_table: str,
    ) -> None:
        # Mirrors handleEdgeOptions validation: source/destination must
        # reference registered vertex tables (ddl/ddl_api.go:1952-1977).
        for ref in (src_table, dst_table):
            if ref not in self.vertices:
                raise ValueError(
                    f"edge table {name}: referenced vertex table {ref!r} "
                    "is not registered"
                )
        self.edges[name] = EdgeTable(name, df, src_col, dst_col, src_table, dst_table)

    def vertex(self, name: str) -> VertexTable:
        return self.vertices[name]

    def edge(self, name: str) -> EdgeTable:
        return self.edges[name]


def default_graph(spark, sf_dir: str) -> GraphSchema:
    """The FIXTURES.md graph over the star schema (deterministic views)."""
    from tidb_spark.catalog import graph_views, load_all

    tables = load_all(spark, sf_dir)
    views = graph_views(tables)
    g = GraphSchema()
    g.add_vertex_table("v_customer", views["v_customer"], "c_custkey")
    g.add_vertex_table("v_order", views["v_order"], "id")
    g.add_edge_table(
        "e_ordered", views["e_ordered"], "src", "dst", "v_customer", "v_order"
    )
    g.add_edge_table(
        "e_knows", views["e_knows"], "src", "dst", "v_customer", "v_customer"
    )
    return g
