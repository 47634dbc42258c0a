"""Split-starvation gate for CPU-heavy stages over small local inputs.

Every synthetic bench table is a single-file, single-row-group parquet:
Spark plans byte-range splits, but parquet assigns a whole row group to
the one split containing its midpoint, so EVERY scan delivers all rows
in ONE task regardless of the split count. Any CPU-heavy expression
fused into the scan stage (tokenize, per-char hashing, vector math,
map-side partial aggregation) then runs on a single core of the 32.

``spread`` repartitions a frame to ``defaultParallelism`` ONLY when the
backing file is split-starved (estimated splits < parallelism) — the
``augmented_documents`` gate, shared. A multi-TB production table has
plenty of splits and row groups, so the gate never fires there and no
shuffle is added; this is the scale-adaptive form the optimization
guide's §2.5 "input skew" remedy calls for (fix at the source if you
can; otherwise repartition immediately after the read).

The gate stats the file rather than calling df.rdd.getNumPartitions —
the DataFrame->RDD conversion costs ~1 s of driver time per query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _size_and_splits(spark: SparkSession, path: str) -> tuple:
    """(total bytes, input splits Spark would plan) for ``path``.
    Non-statable paths (object stores) return (+inf, +inf) — i.e.
    'plenty of splits, don't add a shuffle', the correct default for
    any multi-TB table."""
    try:
        if os.path.isfile(path):
            size = os.path.getsize(path)
        else:
            size = sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if not f.startswith(("_", "."))
            )
    except OSError:
        return float("inf"), float("inf")
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    max_bytes = int("".join(ch for ch in raw if ch.isdigit()) or "134217728")
    return float(size), max(1.0, size / max_bytes)


def estimated_splits(spark: SparkSession, path: str) -> float:
    """Input splits Spark would plan for ``path`` (see _size_and_splits)."""
    return _size_and_splits(spark, path)[1]


def spread(
    spark: SparkSession,
    df: DataFrame,
    sf_dir: str,
    table: str,
    *keys: str,
    min_bytes: int = 0,
) -> DataFrame:
    """Gate-repartition ``df`` (rows of ``{sf_dir}/{table}.parquet``) to
    defaultParallelism on ``keys`` when the source file is split-starved;
    identity otherwise. Hash-repartitioning on a real key (never rand())
    keeps the row-to-partition mapping deterministic under task retry.

    ``min_bytes`` adds a lower size bound: below it the starved scan's
    work is too cheap for the added exchange to pay for itself (measured
    r16-opt: the six tokenize-battery text queries were neutral-to-WORSE
    with an unconditional gate on the 0.58 MB sf0.1 corpus but multiples
    faster on the 5.9 MB sf1 corpus, where one core carries 10x the
    tokenize CPU). The default 0 keeps the original always-fire gate for
    call sites that measured better even at sf0.1."""
    n_parts = spark.sparkContext.defaultParallelism
    size, splits = _size_and_splits(spark, f"{sf_dir}/{table}.parquet")
    if splits < n_parts and size >= min_bytes:
        return df.repartition(n_parts, *keys)
    return df
