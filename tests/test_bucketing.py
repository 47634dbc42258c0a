"""Co-located bucketed join: the fact-fact join scale path. Asserts the
property that matters — zero Exchange (shuffle) operators in the join plan
when both sides are bucketed on the join key."""

import pytest

from pyspark.sql import functions as F

from spark_sql_flow_plugin_spark.sources import load
from spark_sql_flow_plugin_spark.sources.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    t = load(spark, sf_dir, "lineitem", "orders")
    write_bucketed(
        t["lineitem"], "b_lineitem", ["l_orderkey"], n_buckets=8,
        path=str(warehouse / "b_lineitem"),
    )
    write_bucketed(
        t["orders"], "b_orders", ["o_orderkey"], n_buckets=8,
        path=str(warehouse / "b_orders"),
    )
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # hint away the broadcast (these test tables are tiny): at real scale
    # a fact-fact join is sort-merge, which is where bucketing pays off
    joined = (
        spark.table(left)
        .hint("merge")
        .join(spark.table(right), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must not shuffle either side: the only allowed exchange
    # is the one for the final small groupBy
    join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert join_part.count("Exchange") == 0, plan


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    t = load(spark, sf_dir, "lineitem", "orders")
    expected = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    got = (
        spark.table(left)
        .join(spark.table(right), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert got == expected
