"""Observation-based in-query metrics (functions/metrics.py) — the
data-plane complement of the reference's listener wall-clock metrics."""

import pytest
from pyspark.sql import functions as F

from spark_sql_flow_plugin_spark.functions.metrics import row_audit, with_metrics


def test_with_metrics_collects_during_action(spark):
    df = spark.createDataFrame([(1, "a"), (2, None), (3, "c")], "id bigint, v string")
    d2, obs = with_metrics(
        df, n=F.count(F.lit(1)), nulls=F.count_if(F.col("v").isNull())
    )
    assert d2.count() == 3  # the action that was happening anyway
    assert obs.get == {"n": 3, "nulls": 1}


def test_with_metrics_requires_metrics(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        with_metrics(df)


def test_row_audit_counts_per_column_nulls(spark, sf_dir):
    from spark_sql_flow_plugin_spark.sources import load

    docs = load(spark, sf_dir, "documents")["documents"]
    audited, obs = row_audit(docs)
    n = audited.count()
    got = obs.get
    assert got["n_rows"] == n
    assert got["null_doc_id"] == 0
    assert set(got) == {"n_rows"} | {f"null_{c}" for c in docs.columns}


def test_metrics_survive_downstream_transformations(spark):
    # the observe node sits inside the plan: metrics reflect ITS input,
    # not the downstream filter's output
    df = spark.range(100)
    d2, obs = with_metrics(df, n=F.count(F.lit(1)))
    assert d2.where("id < 10").count() == 10
    assert obs.get == {"n": 100}
