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


# ---------------------------------------------------------------------------
# Z-order (Morton) multi-dimensional layout
# ---------------------------------------------------------------------------
#
# Linear partitioning prunes ONE dimension; interleaving the bits of two
# low-cardinality dimension keys into a Morton code makes partitions
# spatially local in BOTH, so a 2-D box predicate touches only the
# partitions whose z-range intersects the box — the technique behind
# Delta/Iceberg OPTIMIZE ZORDER, expressed with plain Spark SQL bit ops.

ZORDER_BITS = 6  # per dimension: 64x64 grid, 12-bit z, bucket = z >> 6


def zvalue_expr(xcol: str, ycol: str, bits: int = ZORDER_BITS) -> str:
    """SQL expression interleaving the low ``bits`` of two int columns into
    a Morton z-value (x in even bit positions, y in odd)."""
    return (
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc"
        f" | CAST(shiftleft(shiftright({xcol}, i) & 1, 2 * i) AS BIGINT)"
        f" | CAST(shiftleft(shiftright({ycol}, i) & 1, 2 * i + 1) AS BIGINT))"
    )


def zvalue(x: int, y: int, bits: int = ZORDER_BITS) -> int:
    """Driver-side twin of :func:`zvalue_expr` for predicate→bucket
    enumeration."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def zorder_buckets_for_box(
    x_lo: int, x_hi: int, y_lo: int, y_hi: int,
    bits: int = ZORDER_BITS, bucket_shift: int = ZORDER_BITS,
) -> list[int]:
    """Partition buckets whose z-range intersects the inclusive box.

    Enumerating the grid cells of the box is exact and cheap at pruning
    granularity (the box is at most 2^bits x 2^bits cells, evaluated once
    on the driver); production systems with deeper codes use BIGMIN-style
    range splitting instead of enumeration, but the contract — a superset
    of buckets, re-filtered exactly after the scan — is the same.
    """
    return sorted(
        {
            zvalue(x, y, bits) >> bucket_shift
            for x in range(x_lo, x_hi + 1)
            for y in range(y_lo, y_hi + 1)
        }
    )
