"""Pure-Python graph model + sink formatting tests (no Spark).

Mirrors the reference's sink unit tests (Neo4jAuraSinkSuite.scala:30-50
style: hand-built nodes/edges → formatted string assertions) and the file
writer's overwrite semantics (SQLFlowSuite.scala:367-398)."""

import os

import pytest

from spark_sql_flow_plugin_spark.plans.graph import GraphEdge, GraphNode, NodeType
from spark_sql_flow_plugin_spark.sinks import (
    AdjacencyListSink,
    GraphVizSink,
    MermaidSink,
)


def _tiny_graph():
    t = GraphNode("default.t1", "default.t1", ["a", "b"], "a int, b int", NodeType.TABLE)
    p = GraphNode("Project_abc1234", "Project", ["a"], "a int", NodeType.PLAN)
    q = GraphNode("query_1", "query_1", ["a"], "a int", NodeType.QUERY)
    edges = [
        GraphEdge("default.t1", 0, "Project_abc1234", 0),
        GraphEdge("Project_abc1234", 0, "query_1", 0),
        GraphEdge("default.t1", None, "query_1", None),
    ]
    return [t, p, q], edges


def test_graphviz_format():
    nodes, edges = _tiny_graph()
    s = GraphVizSink().to_graph_string(nodes, edges)
    assert "digraph {" in s and "rankdir=LR" in s
    # table/query nodes render black with port rows; plan nodes lightgray
    assert '"default.t1" [color="black" label=<' in s
    assert '<table color="lightgray"' in s
    assert '"default.t1":0 -> "Project_abc1234":0;' in s
    # None ordinals render as the nodeName port
    assert '"default.t1":nodeName -> "query_1":nodeName;' in s


def test_graphviz_cached_color():
    nodes, edges = _tiny_graph()
    nodes[0].is_cached = True
    s = GraphVizSink().to_graph_string(nodes, edges)
    assert '"default.t1" [color="lightblue"' in s


def test_graphviz_empty():
    assert GraphVizSink().to_graph_string([], []) == ""


def test_adjacency_dedup():
    nodes, edges = _tiny_graph()
    s = AdjacencyListSink().to_graph_string(nodes, edges)
    lines = s.splitlines()
    assert "default.t1,Project_abc1234" in lines
    assert "default.t1,query_1" in lines  # whole-node edge deduped to node level
    assert len(lines) == len(set(lines)) == 3


def test_mermaid_shapes():
    nodes, edges = _tiny_graph()
    s = MermaidSink().to_graph_string(nodes, edges)
    assert "flowchart LR" in s
    assert '    default.t1[["default.t1(a,b)"]]' in s
    assert "    Project_abc1234(Project)" in s
    assert "    default.t1-->Project_abc1234" in s


def test_write_overwrite_semantics(tmp_path):
    nodes, edges = _tiny_graph()
    out = str(tmp_path / "flow")
    sink = AdjacencyListSink()
    path = sink.write(nodes, edges, out)
    assert os.path.exists(path)
    with pytest.raises(ValueError, match="overwrite"):
        sink.write(nodes, edges, out)
    sink.write(nodes, edges, out, overwrite=True)


def test_append_timestamped_dirs(tmp_path):
    nodes, edges = _tiny_graph()
    out = str(tmp_path / "stream")
    sink = AdjacencyListSink()
    sink.append(nodes, edges, out)
    sink.append(nodes, edges, out)
    assert len(os.listdir(out)) == 2  # one UTC-stamped subdir per append
