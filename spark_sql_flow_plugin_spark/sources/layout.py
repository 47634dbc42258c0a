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
    (read → repartition → write versioned sibling → two-rename repoint).

    Crash-safety contract: the live dataset is never deleted before its
    replacement is in place.  The swap is two renames —

    1. write compacted data to ``{path}.compact-new`` (sibling dir),
    2. verify row count,
    3. rename ``path`` → ``{path}.compact-old``  (live data preserved),
    4. rename ``{path}.compact-new`` → ``path``  (replacement lands),
    5. delete ``{path}.compact-old``.

    A crash between 3 and 4 leaves the dataset intact at
    ``{path}.compact-old``; :func:`recover_compact` restores it.  A crash
    anywhere else leaves ``path`` untouched.

    Filesystem assumptions: directory ``rename`` must be atomic, which
    holds on POSIX local FS and HDFS.  On object stores (S3/GCS) rename is
    copy+delete and NOT atomic — there, compaction must go through a table
    format's transactional commit (Delta/Iceberg ``OPTIMIZE``/rewrite) or a
    catalog repoint (``INSERT OVERWRITE`` into a managed table), not this
    path-level helper.
    """
    import os
    import shutil

    new = path.rstrip("/") + ".compact-new"
    old = path.rstrip("/") + ".compact-old"
    if os.path.exists(old):
        raise RuntimeError(
            f"{old} exists: a previous compact() crashed mid-swap; "
            "run recover_compact() first"
        )
    df = spark.read.parquet(path)
    n = df.count()
    if os.path.exists(new):
        shutil.rmtree(new)  # leftover from a crash before the swap: safe
    df.repartition(target_partitions).write.mode("overwrite").parquet(new)
    assert spark.read.parquet(new).count() == n
    os.rename(path, old)
    os.rename(new, path)
    shutil.rmtree(old)


def recover_compact(path: str) -> bool:
    """Recover from a :func:`compact` crash between its two renames.

    If ``path`` is missing but ``{path}.compact-old`` exists, the crash
    happened after step 3; rename the preserved copy back.  If both exist,
    the crash happened after step 4 (replacement landed); drop the
    leftover.  Returns True if any action was taken.
    """
    import os
    import shutil

    old = path.rstrip("/") + ".compact-old"
    if not os.path.exists(old):
        return False
    if os.path.exists(path):
        shutil.rmtree(old)  # swap completed; old copy is the leftover
    else:
        os.rename(old, path)
    return True


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


def _zorder_cover(
    x_lo: int, x_hi: int, y_lo: int, y_hi: int, bits: int, min_span: int
) -> tuple[list[tuple[int, int]], int]:
    """Quadtree z-range decomposition of an inclusive box (the
    LITMAX/BIGMIN range-splitting equivalent, expressed as recursion).

    Every quadtree node owns one contiguous z-range; recursing only into
    nodes that straddle the box boundary yields the box as O(perimeter ·
    bits) maximal ranges instead of O(area) cells.  ``min_span`` stops the
    recursion early: a node whose z-span is ≤ ``min_span`` is emitted
    whole once it intersects the box (a superset at that granularity —
    exactly what bucket pruning needs, since the scan re-filters exactly).
    Returns ``(ranges, nodes_visited)``; ranges are emitted in increasing
    z order and adjacent ones merged.
    """
    out: list[list[int]] = []
    visited = 0

    def emit(z_lo: int, z_hi: int) -> None:
        if out and out[-1][1] + 1 == z_lo:
            out[-1][1] = z_hi
        else:
            out.append([z_lo, z_hi])

    def rec(x0: int, y0: int, size: int, zbase: int) -> None:
        nonlocal visited
        visited += 1
        if x0 > x_hi or x0 + size - 1 < x_lo or y0 > y_hi or y0 + size - 1 < y_lo:
            return
        span = size * size
        inside = (
            x0 >= x_lo and x0 + size - 1 <= x_hi
            and y0 >= y_lo and y0 + size - 1 <= y_hi
        )
        if inside or span <= min_span:
            emit(zbase, zbase + span - 1)
            return
        h = size // 2
        q = h * h
        # z-order of quadrants: x occupies even bit positions, y odd, so
        # the quadrant index is (y_bit << 1) | x_bit.
        rec(x0, y0, h, zbase)
        rec(x0 + h, y0, h, zbase + q)
        rec(x0, y0 + h, h, zbase + 2 * q)
        rec(x0 + h, y0 + h, h, zbase + 3 * q)

    rec(0, 0, 1 << bits, 0)
    return [(lo, hi) for lo, hi in out], visited


def zorder_ranges_for_box(
    x_lo: int, x_hi: int, y_lo: int, y_hi: int, bits: int = ZORDER_BITS
) -> list[tuple[int, int]]:
    """Exact contiguous z-value ranges covering the inclusive box, via
    quadtree range splitting — O(perimeter · bits) work, not O(area), so
    the technique survives deep Morton codes (bits=16 → 4-billion-cell
    grids) where cell enumeration is impossible."""
    return _zorder_cover(x_lo, x_hi, y_lo, y_hi, bits, min_span=1)[0]


def zorder_buckets_for_box(
    x_lo: int, x_hi: int, y_lo: int, y_hi: int,
    bits: int = ZORDER_BITS, bucket_shift: int = ZORDER_BITS,
) -> list[int]:
    """Partition buckets whose z-range intersects the inclusive box.

    The recursion stops at bucket granularity (z-span ``2**bucket_shift``),
    so driver work is bounded by the buckets touched plus the boundary
    nodes above them — independent of box area.  The result is a superset
    of the exact cell set at bucket granularity; the scan re-filters
    exactly, so the contract is unchanged.
    """
    ranges, _ = _zorder_cover(
        x_lo, x_hi, y_lo, y_hi, bits, min_span=1 << bucket_shift
    )
    buckets: set[int] = set()
    for z_lo, z_hi in ranges:
        buckets.update(range(z_lo >> bucket_shift, (z_hi >> bucket_shift) + 1))
    return sorted(buckets)
