"""DataFrame-native lineage analytics + streaming-plan lineage +
graph→DataFrames materialization."""

from pyspark.sql import functions as F

from spark_sql_flow_plugin_spark import extract
from spark_sql_flow_plugin_spark.plans.graph import to_dataframes
from spark_sql_flow_plugin_spark.plans.graph_analytics import (
    edges_df,
    reachable_from,
    reaching,
    transitive_closure,
)


def test_transitive_closure_chain(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], "src string, dst string"
    )
    pairs = {(r.src, r.dst) for r in transitive_closure(e).collect()}
    assert ("a", "d") in pairs and ("a", "c") in pairs
    assert ("x", "y") in pairs and ("x", "d") not in pairs


def test_closure_handles_cycles(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    pairs = {(r.src, r.dst) for r in transitive_closure(e).collect()}
    assert ("a", "a") in pairs and ("b", "b") in pairs  # terminates, no hang


def test_reachability_over_real_lineage(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.where("l_quantity > 10").groupBy("l_returnflag").count()
    nodes, edges = extract(q, flow_name="flow_reach")
    e = edges_df(spark, edges)
    table_id = next(n.unique_id for n in nodes if n.tpe.value == "TableNode")
    downstream = {r.node_id for r in reachable_from(e, table_id).collect()}
    assert "flow_reach" in downstream
    upstream = {r.node_id for r in reaching(e, "flow_reach").collect()}
    assert table_id in upstream


def test_graph_to_dataframes(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    nodes, edges = extract(li.select("l_orderkey"), flow_name="flow_df")
    nodes_df, e_df = to_dataframes(spark, nodes, edges)
    assert nodes_df.where("tpe = 'TableNode'").count() >= 1
    assert e_df.count() == len(edges)
    # table nodes carry stats props from LeafNode.computeStats
    props = nodes_df.where("tpe = 'TableNode'").select("props").first().props
    assert "sizeInBytes" in props


def test_streaming_plan_lineage(spark, sf_dir):
    """Lineage of a (not-started) streaming query's logical plan — the
    watermarked windowed aggregate shape from streaming/events.py."""
    from spark_sql_flow_plugin_spark.streaming.events import _read_events_stream

    stream = _read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    nodes, edges = extract(agg, flow_name="flow_stream")
    idents = {n.ident for n in nodes}
    assert "Aggregate" in idents
    assert edges
    qnode = next(n for n in nodes if n.tpe.value == "QueryNode")
    assert qnode.attribute_names == ["win", "event_type", "n_events"]
