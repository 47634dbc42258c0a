"""Parquet sources for the TPC-H-ish synthetic star schema.

The driver generates these tables (see TESTDATA.md); every query in the
engine loads through here so scan behavior is uniform: parquet with
predicate pushdown and column pruning left to Catalyst (we never pre-select
columns here — expressing the query declaratively lets the optimizer prune
the scan down to ``ReadSchema`` automatically).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic scale factor.
#: region/nation are fixed-size (5 / 25 rows) at every TPC-H SF.
BROADCAST_DIMS = frozenset({"region", "nation"})


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver has generated events.parquet with two different physical
    types for ``ts`` across rounds: INT64 TIMESTAMP(NANOS) (which Spark's
    parquet reader rejects unless nanos are read as LONG) and plain
    TIMESTAMP(MICROS). ``session.RUNTIME_CONFS`` carries the legacy nanos
    conf so either layout reads (applied once by ``tune``, never mutated
    per call); callers normalize via :func:`convert_event_ts`."""
    tune(spark)
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def convert_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` to session-zone TIMESTAMP (µs precision), matching
    DuckDB's TIMESTAMP on the same file: LONG nanos → timestamp_micros,
    TIMESTAMP_NTZ (micros parquet layout) → plain cast.

    The NTZ→TIMESTAMP cast (and timestamp_micros' epoch interpretation) is
    only DuckDB-equivalent because the session timezone is UTC — a
    non-UTC session would silently shift every event timestamp relative to
    the oracle. ``session.get_session`` pins spark.sql.session.timeZone=UTC;
    assert it here so the coupling is explicit and a future conf change
    fails loudly instead of corrupting results."""
    from pyspark.sql.types import LongType

    tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise AssertionError(
            f"convert_event_ts requires a UTC session timezone, got {tz!r}: "
            "the NTZ->TIMESTAMP cast would shift event timestamps away from "
            "the wall-clock values every other engine reads from this file"
        )
    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load tables by name from ``sf_dir``; returns {name: DataFrame}."""
    tune(spark)
    out: dict[str, DataFrame] = {}
    for name in names or TABLES:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
        if name == "events":
            out[name] = convert_event_ts(load_events_raw(spark, sf_dir))
        else:
            out[name] = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return out


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register tables as temp views so ``spark.sql`` queries can use them."""
    for name, df in load(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
