"""Listener-mode capture (live listener bus) + Neo4j Cypher generation."""

import glob
import re
import time

from spark_sql_flow_plugin_spark.functions import listener as L
from spark_sql_flow_plugin_spark.plans.graph import GraphEdge, GraphNode, NodeType
from spark_sql_flow_plugin_spark.sinks import GraphVizSink
from spark_sql_flow_plugin_spark.sinks.neo4j import (
    Neo4jAuraSink,
    downstream_sink_ids,
    edge_merge_statements,
    node_merge_statements,
)


def test_listener_captures_queries(spark, sf_dir, tmp_path):
    out = str(tmp_path / "audit")
    lst = L.register(spark, GraphVizSink(), out)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        li.groupBy("l_returnflag").count().collect()
        li.where("l_quantity > 40").select("l_orderkey").collect()
        L.wait_for_listener_bus(spark)
        deadline = time.time() + 15
        while time.time() < deadline and lst.captured < 2:
            time.sleep(0.2)
    finally:
        L.unregister(spark, lst)
    assert lst.captured >= 2
    dirs = glob.glob(out + "/*")
    assert len(dirs) >= 2  # one timestamped dir per query
    dot = open(glob.glob(dirs[0] + "/*.dot")[0]).read()
    assert re.search(r"query_\d+", dot)


def test_listener_contracted_mode(spark, sf_dir, tmp_path):
    out = str(tmp_path / "audit_contracted")
    lst = L.register(spark, GraphVizSink(), out, contracted=True)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        li.groupBy("l_returnflag").count().collect()
        L.wait_for_listener_bus(spark)
        deadline = time.time() + 15
        while time.time() < deadline and lst.captured < 1:
            time.sleep(0.2)
    finally:
        L.unregister(spark, lst)
    assert lst.captured >= 1
    dot = open(glob.glob(out + "/*/*.dot")[0]).read()
    # contracted: table + query nodes only — no plan-operator nodes
    assert "Aggregate" not in dot and "lineitem.parquet" in dot


def _graph():
    t = GraphNode("t1", "t1", ["a"], "a int", NodeType.TABLE)
    p = GraphNode("Project_x", "Project", ["a"], "a int", NodeType.PLAN)
    q = GraphNode("query_9", "query_9", ["a"], "a int", NodeType.QUERY)
    edges = [GraphEdge("t1", 0, "Project_x", 0), GraphEdge("Project_x", 0, "query_9", 0)]
    return [t, p, q], edges


def test_dst_node_ids_bfs():
    nodes, edges = _graph()
    dst = downstream_sink_ids(edges, nodes)
    assert dst["t1"] == ["query_9"]
    assert dst["Project_x"] == ["query_9"]
    assert dst["query_9"] == []


def test_cypher_statements():
    nodes, edges = _graph()
    ns = node_merge_statements(nodes)
    assert any("MERGE (n:Table {uid: $key})" in c for c, _ in ns)
    assert any("MERGE (n:Plan {semanticHash: $key})" in c for c, _ in ns)
    es = edge_merge_statements(nodes, edges)
    assert len(es) == 2
    cypher, params = es[0]
    assert "[r:transformInto]" in cypher and params["dst_ids"] == ["query_9"]


def test_neo4j_write_gated_without_driver():
    sink = Neo4jAuraSink("neo4j+s://example", "neo4j", "pw")
    nodes, edges = _graph()
    try:
        import neo4j  # noqa: F401
    except ImportError:
        import pytest

        with pytest.raises(NotImplementedError, match="neo4j"):
            sink.write(nodes, edges)
