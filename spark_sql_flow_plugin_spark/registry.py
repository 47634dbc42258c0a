"""Query registry: the driver-facing inventory of implemented operators.

Each :class:`QuerySpec` couples a PySpark builder with the ANSI-SQL oracle
that DuckDB runs on the same parquet tables (SURVEY.md §2.D). Builders take
``(spark, sf_dir)`` and return an un-collected DataFrame; every computed
column is aliased identically in the Spark code and the oracle SQL so the
driver's order-insensitive value-hash compares apples to apples.

Determinism conventions (cross-engine FP safety):
- Sums of DOUBLE columns go through ``CAST(x AS DECIMAL(18,4))`` so the sum
  is exact and order-independent, then back to DOUBLE for a type both
  engines render identically.
- Averages are computed as exact-decimal-sum / count in both engines.
- Ranking windows always order by a unique key (tie-break included).
- Hash-based operators (minhash, simhash, fingerprints) use md5-derived
  integers — md5 is identical everywhere, unlike murmur3/xxhash builtins.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver records rows-only check
    tags: tuple[str, ...] = field(default=())


_REGISTRY: list[QuerySpec] = []


def register(name: str, oracle: str | None, *tags: str):
    """Decorator: add a builder to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY.append(QuerySpec(name, fn, oracle, tuple(tags)))
        return fn

    return deco


def all_specs() -> list[QuerySpec]:
    # Import side-effect modules exactly once.
    from .operators import (  # noqa: F401
        curation,
        dedup,
        frequency,
        generators,
        graphs,
        misc,
        multimodal,
        pandas_udfs,
        pipeline,
        relational,
        similarity,
        skew,
        subqueries,
        text,
        timeseries,
        tpcds,
        tpch,
        windows,
    )
    from .streaming import events, stateful  # noqa: F401

    return list(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.builder for s in all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
