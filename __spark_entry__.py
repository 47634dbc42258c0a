"""Driver contract for the spark-graft builder (PySpark target).

entry()  — flagship query (TPC-H Q1 shape) on sf0.001.
queries() / oracle_sql() — the full operator inventory from
spark_sql_flow_plugin_spark.registry (SURVEY.md §2.D + NEW LLM-pipeline
operators). Every computed column is aliased identically on the Spark and
DuckDB sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_sql_flow_plugin_spark import registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from spark_sql_flow_plugin_spark.operators.tpch import q1_pricing_summary

    return q1_pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
