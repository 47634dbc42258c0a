"""Output data layout management: partitioned writes with bounded file
sizes, and small-file compaction.

At 100 TB the write side decides the read side's fate: a date-partitioned
table with thousands of KB-sized files per partition destroys scan
parallelism and NameNode/object-store metadata; monolithic files destroy
partition pruning. The helpers here encode the standard discipline:

- partition columns chosen for pruning (low cardinality, used in filters);
- files per partition sized via ``maxRecordsPerFile`` + a repartition on
  the partition key so each task writes few, large files;
- compaction = read + repartition + overwrite (idempotent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write parquet partitioned by ``partition_cols`` with bounded files.

    The repartition on the partition columns routes every row of one output
    partition to ``files_per_partition`` tasks, so a partition gets exactly
    that many files (plus splits forced by ``max_records_per_file``) instead
    of one file per upstream task (the small-files explosion).
    """
    parts = [F.col(c) for c in partition_cols]
    if files_per_partition <= 1:
        shuffled = df.repartition(*parts) if parts else df
    else:
        # salt the shuffle key so each output partition spreads over exactly
        # files_per_partition tasks — no driver-side cardinality counting
        salt = (F.rand(seed=0) * files_per_partition).cast("int")
        shuffled = df.repartition(*parts, salt) if parts else df.repartition(files_per_partition)
    (
        shuffled.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def compact(spark, path: str, target_partitions: int) -> None:
    """Compact a parquet dataset in place to ``target_partitions`` files
    (read → coalesce-via-repartition → overwrite a temp → swap)."""
    import shutil
    import tempfile

    df = spark.read.parquet(path)
    tmp = tempfile.mkdtemp(prefix="compact_")
    df.repartition(target_partitions).write.mode("overwrite").parquet(tmp)
    # verify before swapping
    assert spark.read.parquet(tmp).count() == df.count()
    shutil.rmtree(path)
    shutil.move(tmp, path)
