"""Round-14 property tests.

(a) The `events_decay_engagement` shift clamp (r13 ADVICE, medium): an
    event >= 63 half-lives older than the corpus max timestamp used to
    blow up the oracle (DuckDB raises OutOfRangeException on
    1::BIGINT << 63) while Spark's `shiftleft` masks the shift count
    mod 64 (Java semantics) — so a 64-half-life-old event silently
    contributed at FULL face value.  The committed events fixture spans
    ~30 days (k <= 4), which is exactly why this was never caught by
    the oracle matrix.  This test plants an ancient event on a private
    fixture, runs BOTH engines end-to-end, and keeps a negative-control
    witness of the unclamped Spark expression producing the wrong
    answer.
"""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_sql_flow_plugin_spark.operators.timeseries import (
    _DECAY_HALF_LIFE_US,
    _DECAY_SQL,
    events_decay_engagement,
)

_US = 1_000_000


def _write_events(path, rows):
    """rows: list of (event_id, ts_us, user_id, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(path, "events.parquet"))


@pytest.fixture()
def ancient_events_dir(tmp_path):
    now_us = 1_700_000_000 * _US
    rows = [
        # user 1: one fresh event (k=0) + one 64-half-life-old event.
        (1, now_us, 1, 10.0),
        (2, now_us - 64 * _DECAY_HALF_LIFE_US, 1, 50.0),
        # user 2: k exactly 63 (the first DuckDB-fatal bucket pre-fix).
        (3, now_us - 63 * _DECAY_HALF_LIFE_US, 2, 7.0),
        (4, now_us, 2, 3.0),
        # user 3: k exactly 62 (clamp boundary, contribution still 0).
        (5, now_us - 62 * _DECAY_HALF_LIFE_US, 3, 9.0),
        (6, now_us, 3, 2.0),
        # user 4: moderate decay, sanity that the clamp is inert below it.
        (7, now_us - 3 * _DECAY_HALF_LIFE_US, 4, 8.0),
    ]
    _write_events(str(tmp_path), rows)
    return str(tmp_path)


def test_decay_clamp_survives_ancient_events(spark, ancient_events_dir):
    got = {
        r.user_id: (r.decay_score, r.n_events, r.last_seen_us)
        for r in events_decay_engagement(spark, ancient_events_dir).collect()
    }
    # Exact expectations: ancient contributions are ZERO, fresh at face
    # value in cents.
    now_us = 1_700_000_000 * _US
    assert got[1] == (1000, 2, now_us)  # 50.0 from k=64 contributes 0
    assert got[2] == (300, 2, now_us)  # k=63 contributes 0
    assert got[3] == (200, 2, now_us)  # k=62: 900 >> 62 == 0
    assert got[4] == (100, 1, now_us - 3 * _DECAY_HALF_LIFE_US)

    # The oracle must now RUN (pre-clamp it raised OutOfRangeException)
    # and agree bit-for-bit.
    con = duckdb.connect()
    pq_path = os.path.join(ancient_events_dir, "events.parquet")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{pq_path}')"
    )
    oracle = {
        int(u): (int(s), int(n), int(l))
        for u, s, n, l in con.execute(_DECAY_SQL).fetchall()
    }
    assert oracle == got


def test_decay_unclamped_witness(spark, ancient_events_dir):
    # Negative control pinning WHY the clamp exists: Spark's shiftleft
    # masks the count mod 64, so the unclamped expression counts a
    # 64-half-life-old event (k=64 -> shift by 0) at FULL face value.
    from pyspark.sql import functions as F

    from spark_sql_flow_plugin_spark.sources import load

    ev = load(spark, ancient_events_dir, "events")["events"]
    now_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    bad = (
        ev.select(
            "user_id",
            F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
            F.expr(
                f"CAST(({now_us} - unix_micros(ts)) DIV"
                f" {_DECAY_HALF_LIFE_US} AS BIGINT)"
            ).alias("k"),
        )
        .where("user_id = 1")
        .selectExpr(
            "SUM(cents DIV shiftleft(CAST(1 AS BIGINT), CAST(k AS INT)))"
            " AS unclamped"
        )
        .collect()[0]
        .unclamped
    )
    # 10.0 fresh + the 50.0 ancient event wrongly at face value.
    assert bad == 6000
