"""Data-layout helpers: partitioned writes with bounded file counts and
in-place compaction."""

import glob

from pyspark.sql import functions as F

from spark_sql_flow_plugin_spark.sources import load
from spark_sql_flow_plugin_spark.sources.layout import compact, write_partitioned


def test_write_partitioned_one_file_per_partition(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events")["events"].withColumn(
        "day", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_day")
    write_partitioned(ev, out, ["day"])
    part_dirs = glob.glob(out + "/day=*")
    assert part_dirs, "no partition directories written"
    for d in part_dirs:
        files = glob.glob(d + "/*.parquet")
        assert len(files) == 1, f"{d} has {len(files)} files, expected 1"
    assert spark.read.parquet(out).count() == ev.count()


def test_write_partitioned_respects_max_records(spark, tmp_path):
    df = spark.range(10_000).withColumn("bucket", F.col("id") % 2)
    out = str(tmp_path / "bounded")
    write_partitioned(df, out, ["bucket"], max_records_per_file=1000)
    files = glob.glob(out + "/bucket=*/*.parquet")
    # 10k rows / 1k per file => at least 10 files across both partitions
    assert len(files) >= 10
    assert spark.read.parquet(out).count() == 10_000


def test_compact(spark, tmp_path):
    out = str(tmp_path / "fragmented")
    spark.range(5000).repartition(64).write.parquet(out)
    assert len(glob.glob(out + "/*.parquet")) >= 32
    compact(spark, out, target_partitions=2)
    assert len(glob.glob(out + "/*.parquet")) == 2
    assert spark.read.parquet(out).count() == 5000


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------


def test_zvalue_expr_matches_python_twin(spark):
    from spark_sql_flow_plugin_spark.sources.layout import zvalue, zvalue_expr

    df = spark.range(0, 64).selectExpr(
        "CAST(id % 8 AS INT) AS x", "CAST(id DIV 8 AS INT) AS y"
    )
    rows = df.selectExpr("x", "y", zvalue_expr("x", "y") + " AS z").collect()
    for r in rows:
        assert r["z"] == zvalue(r["x"], r["y"])


def test_zorder_buckets_cover_box_and_prune():
    from spark_sql_flow_plugin_spark.sources.layout import (
        zorder_buckets_for_box,
        zvalue,
    )

    buckets = set(zorder_buckets_for_box(12, 27, 9, 16))
    # superset: every cell of the box maps into a listed bucket
    for x in range(12, 28):
        for y in range(9, 17):
            assert (zvalue(x, y) >> 6) in buckets
    # pruning: the box touches a strict minority of the 64 buckets
    assert len(buckets) < 32


def test_zorder_scan_prunes_partitions(spark, sf_dir):
    from spark_sql_flow_plugin_spark.registry import queries

    df = queries()["zorder_layout_prune"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the bucket IN-list must reach the scan as a PARTITION filter (directory
    # pruning), not a post-scan Filter over all partitions
    assert "PartitionFilters" in plan
    idx = plan.index("PartitionFilters")
    assert "zbucket" in plan[idx : idx + 400]
