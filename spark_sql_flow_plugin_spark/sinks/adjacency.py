"""Adjacency-list sink: deduped node-level ``from<sep>to`` pairs, loadable by
NetworkX (reference basicSinks.scala:214-231, README.md:124-157)."""

from __future__ import annotations

from ..plans.graph import GraphEdge, GraphNode
from .base import GraphFileSink


class AdjacencyListSink(GraphFileSink):
    filename_suffix = "lst"

    def __init__(self, sep: str = ","):
        if len(sep) != 1:
            sep = sep[0]
        self.sep = sep

    def to_graph_string(self, nodes: list[GraphNode], edges: list[GraphEdge]) -> str:
        pairs = sorted({(e.from_id, e.to_id) for e in edges})
        return "\n".join(f"{f}{self.sep}{t}" for f, t in pairs)
