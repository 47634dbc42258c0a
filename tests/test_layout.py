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
