"""column_provenance: single-column impact analysis through the contracted
closure."""

from pyspark.sql import functions as F

import pytest

from spark_sql_flow_plugin_spark.api import column_provenance


def test_column_provenance_simple(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = (
        li.where("l_quantity > 10")
        .groupBy("l_returnflag")
        .agg(
            (F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("rev")
        )
    )
    prov = column_provenance(q, "rev")
    cols = {c for _, c in prov}
    assert cols == {"l_extendedprice", "l_discount"}
    prov_key = column_provenance(q, "l_returnflag")
    assert {c for _, c in prov_key} == {"l_returnflag"}


def test_column_provenance_join(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    q = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("c_acctbal").alias("total_bal"))
    )
    prov = column_provenance(q, "total_bal")
    tables = {t for t, _ in prov}
    assert any("customer" in t for t in tables)
    assert {col for _, col in prov} >= {"c_acctbal"}


def test_column_provenance_unknown_column(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with pytest.raises(KeyError, match="nope"):
        column_provenance(li.select("l_orderkey"), "nope")
