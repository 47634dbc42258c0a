"""Cross-engine-deterministic expression helpers.

Floating-point aggregation order differs between Spark partitions and the
DuckDB oracle, so money-style aggregates are computed in exact DECIMAL and
only converted to DOUBLE at the end. The same formulas appear verbatim in
oracle SQL strings (see registry docstring).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: str | Column, alias: str) -> Column:
    """Exact decimal sum of a double column, surfaced as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,4)")).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Order-independent average: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast("decimal(18,4)")).cast("double") / F.count(c)).alias(alias)


def revenue() -> Column:
    """TPC-H revenue term l_extendedprice * (1 - l_discount), decimal-exact."""
    return (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )


#: SQL fragments for oracle parity (DuckDB side of dsum/davg/revenue).
SQL_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(18,4))) AS DOUBLE)"
SQL_DAVG = "CAST(SUM(CAST({x} AS DECIMAL(18,4))) AS DOUBLE) / COUNT({x})"
SQL_REVENUE = "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))"
