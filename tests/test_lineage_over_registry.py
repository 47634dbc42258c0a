"""Robustness sweep: lineage extraction must handle every plan shape the
query surface produces (joins of all types, Expand, Generate, Window,
pandas-map nodes, subqueries, streaming memory tables). This is the analog
of the reference's 103-query TPC-DS structural suite — no goldens, but every
plan must yield a connected, column-attributed graph without error."""

import pytest

from spark_sql_flow_plugin_spark import extract
from spark_sql_flow_plugin_spark.registry import all_specs

# memory-sink streaming results have trivial plans; exclude the two stream_*
# entries whose builders *run* a streaming query as a side effect
_SKIP = {
    "stream_hourly_counts",
    "stream_user_totals",
    "stream_stateful_user_agg",
    "stream_dedup_exact",
}


@pytest.mark.parametrize(
    "spec", [s for s in all_specs() if s.name not in _SKIP], ids=lambda s: s.name
)
def test_lineage_extracts(spark, sf_dir, spec):
    df = spec.builder(spark, sf_dir)
    nodes, edges = extract(df, flow_name=f"flow_{spec.name}")
    assert nodes and edges
    by_id = {n.unique_id for n in nodes}
    # every edge endpoint resolves to a node
    for e in edges:
        assert e.from_id in by_id and e.to_id in by_id
    # the query node carries the DataFrame's column names
    qnode = next(n for n in nodes if n.tpe.value == "QueryNode")
    assert qnode.attribute_names == df.columns
    # contracted mode also works and only keeps leaves + query
    cnodes, _ = extract(df, contracted=True, flow_name=f"c_{spec.name}")
    assert {n.tpe.value for n in cnodes} <= {"TableNode", "LeafPlanNode", "QueryNode"}
    # every sink formatter renders every plan shape without error — a
    # reference user saves DOT/Mermaid/adjacency for arbitrary queries
    from spark_sql_flow_plugin_spark.sinks.adjacency import AdjacencyListSink
    from spark_sql_flow_plugin_spark.sinks.graphviz import GraphVizSink
    from spark_sql_flow_plugin_spark.sinks.mermaid import MermaidSink

    dot = GraphVizSink().to_graph_string(nodes, edges)
    assert "digraph" in dot and qnode.unique_id in dot
    mmd = MermaidSink().to_graph_string(nodes, edges)
    assert ("flowchart" in mmd or "graph" in mmd) and qnode.unique_id in mmd
    adj = AdjacencyListSink().to_graph_string(nodes, edges)
    assert adj.strip(), "empty adjacency output"
