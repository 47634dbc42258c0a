"""Streaming differential fuzz (r13 verdict item #4).

(a) A CI slice of the stream≡batch sweep: one builder applied to a
    batch read AND an availableNow stream of the same staged multi-file
    events copy must agree as multisets, across stateful shapes
    (windowed aggs, dropDuplicates, keyed totals) and multi-batch
    replay (maxFilesPerTrigger 1/2).

(b) The NEGATIVE-CONTROL witness: with a watermark, stream ≡ batch is
    genuinely FALSE — a late row beyond the watermark is dropped by the
    stream and kept by batch, and an unfinalized window is held back by
    append mode. The witness pins that documented semantic difference
    on a hand-staged 3-file fixture with forced pickup order, so the
    fuzzer's restriction to no-watermark shapes is a recorded decision,
    not an omission.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_sql_flow_plugin_spark import stream_fuzz

_US = 1_000_000
_BASE = 1_704_448_800  # 2024-01-05 10:00:00 UTC


def test_stream_fuzz_seeds_green(spark, sf_dir, tmp_path):
    staged = stream_fuzz.stage_events(spark, sf_dir, str(tmp_path / "staged"))
    shapes_nonempty = set()
    for seed in range(10):
        rec = stream_fuzz.run_stream_seed(spark, staged, seed)
        assert rec["ok"], f"seed {seed}: {rec.get('err')}"
        if rec["n_rows"]:
            shapes_nonempty.add(rec["shape"])
    # richness: the slice is not allowed to pass vacuously
    assert len(shapes_nonempty) >= 3, shapes_nonempty


def _write_file(path, ts_list, start_id, mtime):
    n = len(ts_list)
    tbl = pa.table(
        {
            "event_id": pa.array(range(start_id, start_id + n), pa.int64()),
            "ts": pa.array([t * _US for t in ts_list], pa.timestamp("us")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def test_watermark_late_drop_witness(spark, tmp_path):
    # Spark 3.4+ runs TWO watermarks per stateful operator: the
    # late-row filter uses the PREVIOUS micro-batch's watermark while
    # eviction uses the current one (probed on this build: a row one
    # batch late MERGES into not-yet-evicted state — dropped=0 — and
    # its window still emits). So the witness's late row must arrive
    # two batches after the watermark passed it:
    #   file A: five 10:00-10:59 events  -> wm after A = 10:29
    #   file B: one 13:00 event          -> late-filter wm 10:29 (keeps
    #            it), wm after B = 12:30
    #   file C: one 08:00 event          -> late-filter wm = 12:30 ->
    #            window end 09:00 < 12:30 -> DROPPED
    # Forced oldest-first pickup order via mtimes.
    from pyspark.sql import functions as F

    from spark_sql_flow_plugin_spark.sources.tables import convert_event_ts
    from spark_sql_flow_plugin_spark.streaming.events import _run_to_memory

    d = str(tmp_path)
    h = 3600
    _write_file(
        os.path.join(d, "a.parquet"),
        [_BASE, _BASE + 600, _BASE + 1200, _BASE + 1800, _BASE + 3540],
        0,
        1_700_000_000,
    )
    _write_file(os.path.join(d, "b.parquet"), [_BASE + 3 * h], 10, 1_700_000_010)
    _write_file(os.path.join(d, "c.parquet"), [_BASE - 2 * h], 11, 1_700_000_020)

    def build(df):
        return (
            df.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select(F.col("w.start").cast("long").alias("ws"), "n")
        )

    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(d)
    )
    got = {
        (r.ws, r.n)
        for r in _run_to_memory(
            build(convert_event_ts(stream)), "append"
        ).collect()
    }
    batch = {
        (r.ws, r.n)
        for r in build(convert_event_ts(spark.read.parquet(d))).collect()
    }
    # batch keeps all three windows
    assert batch == {(_BASE, 5), (_BASE - 2 * h, 1), (_BASE + 3 * h, 1)}
    # the stream: the 08:00 row DROPPED (two batches late — its window
    # end sits below the PREVIOUS batch's watermark), the 13:00 window
    # HELD BACK (append mode, never finalized) — only the 10:00 window
    # is emitted. This is exactly why the fuzzer's equality shapes are
    # watermark-free.
    assert got == {(_BASE, 5)}
