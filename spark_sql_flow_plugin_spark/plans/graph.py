"""Lineage property-graph model.

Mirrors the reference's data model (interfaces.scala:22-69): nodes are
tables / views / plan operators / queries carrying their column names and a
schema DDL string; edges are column-ordinal → column-ordinal references
(``None`` ordinal = whole-node edge).

The graph itself is metadata-sized (thousands of nodes for a large catalog),
so plain Python objects are the right representation; ``to_dataframes``
materializes nodes/edges as Spark DataFrames when graph-scale analytics
(reachability joins over millions of queries) are needed instead of a graph
database.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class NodeType(Enum):
    """Five node classes (reference interfaces.scala:22-24); sink styling and
    Neo4j labels key off these."""

    TABLE = "TableNode"
    VIEW = "ViewNode"
    PLAN = "PlanNode"
    LEAF_PLAN = "LeafPlanNode"
    QUERY = "QueryNode"


@dataclass
class GraphNode:
    """(reference interfaces.scala:26-47)"""

    unique_id: str
    ident: str
    attribute_names: list[str]
    schema_ddl: str
    tpe: NodeType
    is_cached: bool = False
    props: dict[str, str] = field(default_factory=dict)

    def __str__(self) -> str:  # parity with SQLFlowGraphNode.toString
        return f"name=`{self.ident}`({self.unique_id}), type={self.tpe.value}"


@dataclass(frozen=True)
class GraphEdge:
    """Column-level reference edge (reference interfaces.scala:49-60).

    ``from_idx``/``to_idx`` are 0-based column ordinals; ``None`` means the
    edge targets/leaves the node as a whole (fallback edges)."""

    from_id: str
    from_idx: int | None
    to_id: str
    to_idx: int | None

    def __str__(self) -> str:
        f = f":{self.from_idx}" if self.from_idx is not None else ""
        t = f":{self.to_idx}" if self.to_idx is not None else ""
        return f"{self.from_id}{f} -> {self.to_id}{t}"


def to_dataframes(spark, nodes: list[GraphNode], edges: list[GraphEdge]):
    """Materialize the graph as two DataFrames for at-scale analytics
    (Spark SQL joins over the edge table replace graph-DB traversals)."""
    node_rows = [
        (n.unique_id, n.ident, n.attribute_names, n.schema_ddl, n.tpe.value, n.is_cached, n.props)
        for n in nodes
    ]
    edge_rows = [(e.from_id, e.from_idx, e.to_id, e.to_idx) for e in edges]
    nodes_df = spark.createDataFrame(
        node_rows,
        "unique_id string, ident string, attribute_names array<string>, "
        "schema_ddl string, tpe string, is_cached boolean, props map<string,string>",
    )
    edges_df = spark.createDataFrame(
        edge_rows, "from_id string, from_idx int, to_id string, to_idx int"
    )
    return nodes_df, edges_df
