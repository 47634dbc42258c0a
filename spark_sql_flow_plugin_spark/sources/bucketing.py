"""Bucketed tables: co-located joins and aggregations without a shuffle.

At 100 TB the dominant cost of fact-fact joins (lineitem ⋈ orders) is the
exchange. Writing both tables bucketed by the join key into the warehouse
means Spark can sort-merge join them with **zero** Exchange operators —
the bucketing IS the shuffle, paid once at write time and amortized over
every subsequent join/aggregation on that key.

``spark.sql.sources.bucketing.enabled`` is on by default; bucket pruning
and bucketed scans appear in the plan as ``SelectedBucketsCount`` /
absence of ``Exchange``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    overwrite: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    ``n_buckets`` should be sized so one bucket of the *largest* co-located
    table fits an executor core's working memory at target scale; both sides
    of a co-located join must use the same count and keys. ``path`` makes it
    an external table (the warehouse dir is a static conf).
    """
    writer = df.write.format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if overwrite:
        writer = writer.mode("overwrite")
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the plan
    contains no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
