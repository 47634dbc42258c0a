"""Physical-plan quality gates: the properties that decide whether these
operators survive a 100 TB run are asserted here, not eyeballed —
predicate pushdown into the parquet scan, column pruning (ReadSchema),
broadcast joins for small dims, and no accidental cartesian products."""

from spark_sql_flow_plugin_spark.registry import queries


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark, sf_dir):
    df = queries()["q1_pricing_summary"](spark, sf_dir)
    plan = _physical(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # only the 6 needed columns reach the scan — not all 11
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_join_inner_broadcasts_dims(spark, sf_dir):
    plan = _physical(queries()["join_inner"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never force a sort-merge
    assert "CartesianProduct" not in plan


def test_q5_no_cartesian(spark, sf_dir):
    plan = _physical(queries()["q5_local_supplier_volume"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_semi_join_stays_semi(spark, sf_dir):
    plan = _physical(queries()["join_left_semi"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_minhash_no_cartesian(spark, sf_dir):
    # LSH candidate generation must be an equi-join on (band, key), never a
    # cross join over documents
    plan = _physical(queries()["dedup_minhash_lsh"](spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    # map-side combine: HashAggregate appears below AND above the exchange
    plan = _physical(queries()["agg_groupby_having"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
