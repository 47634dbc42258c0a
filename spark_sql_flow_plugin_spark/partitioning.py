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


def estimated_splits(spark: SparkSession, path: str) -> float:
    """Input splits Spark would plan for ``path``: total bytes /
    maxPartitionBytes. Non-statable paths (object stores) return +inf —
    i.e. 'plenty of splits, don't add a shuffle', the correct default
    for any multi-TB table."""
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
        return float("inf")
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    max_bytes = int("".join(ch for ch in raw if ch.isdigit()) or "134217728")
    return max(1.0, size / max_bytes)


def spread(
    spark: SparkSession, df: DataFrame, sf_dir: str, table: str, *keys: str
) -> DataFrame:
    """Gate-repartition ``df`` (rows of ``{sf_dir}/{table}.parquet``) to
    defaultParallelism on ``keys`` when the source file is split-starved;
    identity otherwise. Hash-repartitioning on a real key (never rand())
    keeps the row-to-partition mapping deterministic under task retry."""
    n_parts = spark.sparkContext.defaultParallelism
    if estimated_splits(spark, f"{sf_dir}/{table}.parquet") < n_parts:
        return df.repartition(n_parts, *keys)
    return df
