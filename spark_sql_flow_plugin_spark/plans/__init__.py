from .graph import GraphEdge, GraphNode, NodeType

__all__ = ["GraphEdge", "GraphNode", "NodeType"]
