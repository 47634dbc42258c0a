from .base import BaseGraphFormat, GraphFileSink, write_graph_file
from .adjacency import AdjacencyListSink
from .graphviz import GraphVizSink
from .mermaid import MermaidSink

__all__ = [
    "AdjacencyListSink",
    "BaseGraphFormat",
    "GraphFileSink",
    "GraphVizSink",
    "MermaidSink",
    "write_graph_file",
]
