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


def test_compact_crash_between_renames_preserves_data(spark, tmp_path, monkeypatch):
    """A crash after the live dataset is moved aside but before the
    replacement lands must not lose data: recover_compact restores it."""
    import os

    from spark_sql_flow_plugin_spark.sources.layout import recover_compact

    out = str(tmp_path / "crashy")
    spark.range(3000).repartition(16).write.parquet(out)

    real_rename = os.rename
    calls = {"n": 0}

    def failing_second_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated crash between renames")
        real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_second_rename)
    try:
        compact(spark, out, target_partitions=2)
    except OSError:
        pass
    monkeypatch.setattr(os, "rename", real_rename)

    # live path is gone, but the data survives at .compact-old
    assert not os.path.exists(out)
    assert os.path.exists(out + ".compact-old")
    assert recover_compact(out) is True
    assert spark.read.parquet(out).count() == 3000
    # after recovery, a clean compact succeeds
    compact(spark, out, target_partitions=2)
    assert len(glob.glob(out + "/*.parquet")) == 2
    assert spark.read.parquet(out).count() == 3000


def test_compact_crash_before_swap_leaves_live_untouched(spark, tmp_path, monkeypatch):
    import os

    out = str(tmp_path / "crashy2")
    spark.range(1000).repartition(8).write.parquet(out)

    def always_fail(src, dst):
        raise OSError("simulated crash before any rename")

    monkeypatch.setattr(os, "rename", always_fail)
    try:
        compact(spark, out, target_partitions=2)
    except OSError:
        pass
    # first rename failed: live data untouched, nothing to recover
    assert spark.read.parquet(out).count() == 1000
    from spark_sql_flow_plugin_spark.sources.layout import recover_compact

    assert recover_compact(out) is False


def test_zorder_ranges_exact_and_bounded_at_bits16():
    """BIGMIN-style range splitting: exact cover of the box, with driver
    work bounded by perimeter·bits — NOT box area — at a deep Morton code."""
    from spark_sql_flow_plugin_spark.sources.layout import (
        _zorder_cover,
        zorder_ranges_for_box,
        zvalue,
    )

    bits = 16
    x_lo, x_hi, y_lo, y_hi = 1000, 1999, 2000, 3099  # 1000 x 1100 box
    area = (x_hi - x_lo + 1) * (y_hi - y_lo + 1)  # 1.1M cells
    ranges, visited = _zorder_cover(x_lo, x_hi, y_lo, y_hi, bits, min_span=1)
    # enumeration bound: visited nodes are a tiny fraction of the area
    assert visited < area / 20, f"visited {visited} nodes for area {area}"
    # exactness: spot cells inside map into a range, outside don't
    import bisect

    starts = [lo for lo, _ in ranges]

    def covered(z):
        i = bisect.bisect_right(starts, z) - 1
        return i >= 0 and ranges[i][0] <= z <= ranges[i][1]

    for x, y, want in [
        (1000, 2000, True), (1999, 3099, True), (1500, 2500, True),
        (999, 2500, False), (2000, 2500, False), (1500, 1999, False),
        (1500, 3100, False), (0, 0, False), (65535, 65535, False),
    ]:
        assert covered(zvalue(x, y, bits)) is want, (x, y)
    # total covered z-count equals the box area (exact cover, no slack)
    assert sum(hi - lo + 1 for lo, hi in ranges) == area


def test_zorder_buckets_match_bruteforce_at_default_grid():
    """The range-split bucket list equals brute-force cell enumeration on
    the default 64x64 grid (the granularity the registered query uses)."""
    from spark_sql_flow_plugin_spark.sources.layout import (
        zorder_buckets_for_box,
        zvalue,
    )

    for box in [(12, 27, 9, 16), (0, 63, 0, 63), (5, 5, 7, 7), (0, 0, 0, 63)]:
        x_lo, x_hi, y_lo, y_hi = box
        brute = sorted(
            {
                zvalue(x, y) >> 6
                for x in range(x_lo, x_hi + 1)
                for y in range(y_lo, y_hi + 1)
            }
        )
        assert zorder_buckets_for_box(*box) == brute, box


def test_zorder_bucket_enumeration_bounded_at_bits16():
    """At bits=16 with bucket_shift=20 (4096 z-values per bucket), bucket
    enumeration for a large box visits far fewer nodes than the box area."""
    from spark_sql_flow_plugin_spark.sources.layout import _zorder_cover

    bits, shift = 16, 20
    ranges, visited = _zorder_cover(0, 40000, 0, 40000, bits, min_span=1 << shift)
    assert visited < 10_000  # vs 1.6e9 cells brute force
    assert ranges  # non-empty cover
