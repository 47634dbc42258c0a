"""Time-series joins (NEW — SURVEY.md §7 M7): as-of join and bounded
range join over the events table.

Spark has no native ASOF/RANGE join operator, so both are expressed as
compositions of shuffles Catalyst already optimizes well:

- as-of: the union+window trick — one shuffle on the partition key, a
  single ordered pass per partition, no join explosion. This is the
  standard scale pattern (a naive ``l.ts >= r.ts`` theta-join degenerates
  to a per-key cross product).
- range: bucketize both sides to the window granularity and equi-join on
  (key, bucket) — candidate pairs are bounded by bucket occupancy instead
  of per-key cardinality squared; the exact range predicate filters
  within the bucket-matched candidates.

DuckDB verifies both: it ships a native ASOF JOIN, and the range join is
plain SQL.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..functions.exprs import SQL_DSUM
from ..registry import register
from ..sources import load


@register(
    "asof_join_click_purchase",
    """
    WITH ref AS (
        SELECT user_id, ts, MAX(value) AS click_value
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
    l AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase')
    SELECT l.event_id, l.user_id, l.ts, l.value,
           r.ts AS click_ts, r.click_value
    FROM l ASOF LEFT JOIN ref r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "timeseries",
)
def asof_join_click_purchase(spark, sf_dir):
    """As-of join: each purchase gets the user's most recent click at or
    before it (attribution's last-touch primitive).

    Union both streams, window per user ordered by (ts, refs-first), and
    take the last non-null ref struct up to the current row: ONE shuffle
    on user_id, one sort per partition, zero join fan-out. Reference rows
    sort before left rows at equal ts so a same-instant click matches
    (ASOF's ``>=`` contract). Clicks are pre-deduped per (user, ts) with
    MAX(value) — both engines then pick the same match deterministically.
    """
    ev = load(spark, sf_dir, "events")["events"]
    ref = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "ts",
            F.lit(None).cast("double").alias("value"),
            F.lit(1).alias("is_ref"),
            F.struct("ts", "click_value").alias("ref"),
        )
    )
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lit(0).alias("is_ref"),
        F.lit(None)
        .cast("struct<ts:timestamp,click_value:double>")
        .alias("ref"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_ref").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = ref.unionByName(left).withColumn(
        "last_ref", F.last("ref", ignorenulls=True).over(w)
    )
    return matched.where(F.col("is_ref") == 0).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("last_ref.ts").alias("click_ts"),
        F.col("last_ref.click_value").alias("click_value"),
    )


@register(
    "range_join_error_views",
    """
    WITH err AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
    v AS (
        SELECT user_id, ts AS vts FROM events WHERE event_type = 'view')
    SELECT e.event_id, e.user_id, e.ts,
           COUNT(v.vts) AS n_views_1h
    FROM err e LEFT JOIN v
      ON e.user_id = v.user_id
     AND v.vts >= e.ts AND v.vts < e.ts + INTERVAL 1 HOUR
    GROUP BY e.event_id, e.user_id, e.ts
    """,
    "timeseries",
)
def range_join_error_views(spark, sf_dir):
    """Bounded range join: views within one hour AFTER each error, per
    user (the did-the-user-recover probe).

    Scale shape: both sides bucketize to the 1-hour window granularity;
    the error side lands in its own bucket and the next (a 1h window can
    only span two hour buckets), the join is an EQUI-join on
    (user_id, bucket) — so candidates are bounded by bucket occupancy,
    never the per-user event count squared — and the exact range
    predicate prunes inside the bucket. A plain theta-join here would be
    a per-user cross product.
    """
    ev = load(spark, sf_dir, "events")["events"]
    hour_us = 3_600_000_000
    bucket = (F.unix_micros(F.col("ts")) / hour_us).cast("long")
    err = ev.where(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        "ts",
        F.explode(F.array(bucket, bucket + 1)).alias("bucket"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("vts"),
        bucket.alias("v_bucket"),
    )
    hits = err.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("bucket") == F.col("v_bucket"))
        & (F.col("vts") >= F.col("ts"))
        & (F.col("vts") < F.col("ts") + F.expr("INTERVAL 1 HOUR")),
    ).groupBy("event_id").agg(F.count("*").alias("n_hits"))
    base = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    return base.join(hits, "event_id", "left").select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_views_1h"),
    )


@register(
    "hypertable_rollup_daily",
    f"""
    SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n_events,
           {SQL_DSUM.format(x='value')} AS total_value,
           MAX(value) AS max_value
    FROM events GROUP BY user_id, date_trunc('day', ts)
    """,
    "timeseries",
)
def hypertable_rollup_daily(spark, sf_dir):
    """Hypertable-style continuous aggregate: the DAILY rollup is computed
    FROM the hourly rollup, not from raw events — the two-level partial
    re-aggregation every time-series store (TimescaleDB continuous
    aggregates, Druid rollup) runs so refreshes touch hours, not raw rows.
    At 100 TB the hourly layer is what you'd persist; the daily pass then
    reads ~1/1000th of the raw volume.

    Value sums stay DECIMAL through BOTH levels (only the final select
    casts to double), so the re-aggregated result is bit-identical to the
    oracle's single-level sum — count/max/min re-aggregate exactly by
    algebra; float sums wouldn't.
    """
    ev = load(spark, sf_dir, "events")["events"]
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("dec_value"),
        F.max("value").alias("max_value"),
    )
    return (
        hourly.groupBy(
            "user_id", F.date_trunc("day", F.col("hour")).alias("day")
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("dec_value").cast("double").alias("total_value"),
            F.max("max_value").alias("max_value"),
        )
        .select("user_id", "day", "n_events", "total_value", "max_value")
    )


@register(
    "events_json_props",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
    "timeseries",
)
def events_json_props(spark, sf_dir):
    """Semi-structured extraction — every pipeline's event payloads are
    JSON strings. Two JVM-side paths shown (no Python): `from_json` with
    an explicit schema (typed struct, catches schema drift as nulls) for
    the aggregated value, `get_json_object` path-expression for the
    bounds. Both compile to codegen'd JSON parsing; the parse happens
    once per row pre-shuffle and only (event_type, partial aggregates)
    move."""
    ev = load(spark, sf_dir, "events")["events"]
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k BIGINT").getField("k").alias("k_struct"),
        F.get_json_object("props", "$.k").cast("long").alias("k_path"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k_struct").alias("sum_k"),
        F.min("k_path").alias("min_k"),
        F.max("k_path").alias("max_k"),
    )


@register(
    "pivot_event_counts",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
    "timeseries",
)
def pivot_event_counts(spark, sf_dir):
    """`groupBy().pivot()` — long-to-wide reshaping. The pivot VALUES are
    passed explicitly: with an explicit list Spark skips the extra
    distinct-collect job it otherwise runs to discover the columns (a
    full scan at 100 TB) and the output schema is deterministic."""
    ev = load(spark, sf_dir, "events")["events"]
    kinds = ["click", "error", "purchase", "signup", "view"]
    wide = ev.groupBy("user_id").pivot("event_type", kinds).count()
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds],
    )


@register(
    "map_type_roundtrip",
    """
    SELECT user_id, event_type, COUNT(*) AS cnt
    FROM events GROUP BY user_id, event_type
    """,
    "timeseries",
)
def map_type_roundtrip(spark, sf_dir):
    """MapType round-trip: per-user counts packed into a MAP column
    (map_from_entries over sorted entries) and exploded back to rows —
    the schema shape feature stores and JSON-ish exports use. The
    round-trip is lossless, so the oracle is the plain GROUP BY."""
    ev = load(spark, sf_dir, "events")["events"]
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    packed = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    return packed.select(
        "user_id", F.explode("m").alias("event_type", "cnt")
    )


@register(
    "recursive_month_spine",
    """
    WITH RECURSIVE spine(m, maxm) AS (
        SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE),
               CAST(date_trunc('month', MAX(o_orderdate)) AS DATE)
        FROM orders
        UNION ALL
        SELECT CAST((m + INTERVAL 1 MONTH) AS DATE), maxm FROM spine
        WHERE m < maxm),
    c AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               COUNT(*) AS n
        FROM orders GROUP BY 1)
    SELECT spine.m AS month,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_orders,
           CAST(SUM(COALESCE(c.n, 0)) OVER (ORDER BY spine.m) AS BIGINT)
               AS cume_orders
    FROM spine LEFT JOIN c ON spine.m = c.m
    """,
    "timeseries",
)
def recursive_month_spine(spark, sf_dir):
    """Recursive CTE (Spark 4): generate a gapless month spine between the
    corpus' min and max order months and gap-fill monthly order counts —
    the calendar-dimension pattern every reporting pipeline needs (a bare
    GROUP BY silently drops empty months; the spine keeps them as zero
    rows and makes the running total correct across gaps).

    Scale posture: the recursion only materializes the spine (~one row per
    month — driver-tiny at any corpus size; its depth is bounded by the
    date SPAN, not the row count), declared plan-locally via MAX RECURSION
    LEVEL 500 — no session conf touched. The max-month bound rides along
    as a spine COLUMN computed once in the anchor: a scalar subquery in
    the recursive step would re-scan orders per recursion level (measured
    27 s vs 3 s at sf0.001). The only data-sized operation is
    the monthly count aggregate; the spine side broadcasts into the join.
    """
    ords = load(spark, sf_dir, "orders")["orders"]
    ords.createOrReplaceTempView("orders_spine_src")
    return spark.sql(
        """
        WITH RECURSIVE spine(m, maxm) MAX RECURSION LEVEL 500 AS (
            SELECT CAST(date_trunc('MONTH', MIN(o_orderdate)) AS DATE),
                   CAST(date_trunc('MONTH', MAX(o_orderdate)) AS DATE)
            FROM orders_spine_src
            UNION ALL
            SELECT add_months(m, 1), maxm FROM spine
            WHERE m < maxm),
        c AS (
            SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS m,
                   COUNT(*) AS n
            FROM orders_spine_src GROUP BY 1)
        SELECT spine.m AS month,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n_orders,
               CAST(SUM(COALESCE(c.n, 0)) OVER (ORDER BY spine.m) AS BIGINT)
                   AS cume_orders
        FROM spine LEFT JOIN c ON spine.m = c.m
        """
    )


@register(
    "variant_extract_battery",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0 AS k_is_even
    FROM events
    """,
    "timeseries",
)
def variant_extract_battery(spark, sf_dir):
    """VARIANT type (Spark 4): ``parse_json`` once into the binary variant
    encoding, then typed path extraction with ``variant_get`` and null-safe
    probing of absent paths with ``try_variant_get`` — the
    semi-structured-column workflow that replaces per-path JSON re-parsing
    (variant parses once and shreds; ``get_json_object`` re-parses the
    string per expression). DuckDB has no variant, so the oracle uses its
    JSON path functions on the same payloads — equal VALUES prove the
    variant path semantics, which is the point of the check."""
    ev = load(spark, sf_dir, "events")["events"]
    parsed = ev.select("event_id", F.parse_json("props").alias("v"))
    extracted = parsed.select(
        "event_id",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k_num"),
        F.expr("try_variant_get(v, '$.missing', 'bigint')").alias("k_missing"),
    )
    return extracted.select(
        "event_id",
        "k_num",
        "k_missing",
        (F.col("k_num") % 2 == 0).alias("k_is_even"),
    )


@register(
    "hypertable_incremental_refresh",
    f"""
    SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           COUNT(*) AS n_events,
           {SQL_DSUM.format(x='value')} AS sum_value
    FROM events
    GROUP BY user_id, date_trunc('hour', ts)
    """,
    "timeseries",
)
def hypertable_incremental_refresh(spark, sf_dir):
    """Incremental continuous-aggregate refresh (TimescaleDB invalidation
    semantics): a late-arriving batch (event_id % 17 — ~6% of events) must
    update the hourly rollup WITHOUT recomputing it. Buckets untouched by
    the late batch are carried over from the existing rollup via an
    anti-join; only the dirty (user_id, hour) buckets are recomputed, from
    the base events SEMI-JOINED down to those buckets plus the late rows.

    The oracle is the FULL recompute over all events — so the check proves
    the incremental merge is exactly equivalent, which is the entire
    correctness obligation of an incremental view maintenance engine.
    Partial sums stay DECIMAL through the carry-over/recompute split (only
    the final projection casts to double), so merged and recomputed
    buckets are bit-identical to the one-shot aggregation.

    At 100 TB: the dirty-bucket set is proportional to the LATE data, not
    the table; with the rollup stored partitioned by hour, the semi-join
    becomes partition-pruned reads of just the invalidated hours."""
    ev = load(spark, sf_dir, "events")["events"].withColumn(
        "hour", F.date_trunc("hour", "ts")
    )
    base = ev.where(F.col("event_id") % 17 != 0)
    late = ev.where(F.col("event_id") % 17 == 0)

    def hourly_dec(df):
        return df.groupBy("user_id", "hour").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("dec_value"),
        )

    existing = hourly_dec(base)
    dirty = late.select("user_id", "hour").distinct()
    untouched = existing.join(dirty, ["user_id", "hour"], "left_anti")
    base_dirty = base.join(dirty, ["user_id", "hour"], "left_semi")
    recomputed = hourly_dec(base_dirty.unionByName(late))
    return untouched.unionByName(recomputed).select(
        "user_id",
        "hour",
        "n_events",
        F.col("dec_value").cast("double").alias("sum_value"),
    )


@register(
    "events_funnel_steps",
    """
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
        GROUP BY e.user_id),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id)
    SELECT step, n_users FROM (
        SELECT 1 AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
        UNION ALL
        SELECT 2, CAST(COUNT(*) AS BIGINT) FROM s2
        UNION ALL
        SELECT 3, CAST(COUNT(*) AS BIGINT) FROM s3)
    """,
    "timeseries",
)
def events_funnel_steps(spark, sf_dir):
    """Ordered conversion funnel (view -> click -> purchase): a user
    advances a step only with an event strictly AFTER their previous
    step's first event — the product-analytics primitive behind every
    conversion dashboard.

    Shape: three per-user aggregations chained by user_id equi-joins (each
    stage's right side is one row per user — no join explosion); the step
    tables are persisted because each feeds BOTH the next stage's join and
    its own scalar count — without that, the step-3 branch re-derives the
    whole chain and the event stream is scanned six times instead of
    three. The final counts are three scalar aggregates over user-sized
    tables."""
    from ..caching import scope_caches

    ev = load(spark, sf_dir, "events")["events"]
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .persist()
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .persist()
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    one = (
        s1.agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit(1).alias("step"), "n_users")
    )
    two = (
        s2.agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit(2).alias("step"), "n_users")
    )
    three = (
        s3.agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit(3).alias("step"), "n_users")
    )
    return scope_caches(one.unionByName(two).unionByName(three), s1, s2)


@register(
    "retention_cohorts",
    """
    WITH cohorts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort FROM events
        GROUP BY user_id)
    SELECT c.cohort,
           date_diff('day', c.cohort, CAST(e.ts AS DATE)) AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN cohorts c ON e.user_id = c.user_id
    GROUP BY c.cohort, day_offset
    """,
    "timeseries",
)
def retention_cohorts(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-seen date, then
    distinct-user counts per (cohort, day offset) — the growth-analytics
    staple.

    Shape: one per-user aggregation builds the user->cohort map (one row
    per user); joining it back to the event stream clusters on user_id
    (same partitioning as the aggregation's output, no extra exchange for
    the probe side); the final count-distinct is over (cohort, offset)
    cells, which partial-aggregates map-side to the triangle's size."""
    ev = load(spark, sf_dir, "events")["events"]
    cohorts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort")
    )
    return (
        ev.join(cohorts, "user_id")
        .select(
            "cohort",
            F.datediff(F.to_date("ts"), F.col("cohort")).alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "events_markov_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events),
    pairs AS (SELECT event_type, next_type FROM seq WHERE next_type IS NOT NULL),
    tot AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_from
        FROM pairs GROUP BY event_type)
    SELECT p.event_type AS from_type, p.next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n_trans,
           CAST(COUNT(*) AS DOUBLE) / CAST(ANY_VALUE(t.n_from) AS DOUBLE) AS p_trans
    FROM pairs p JOIN tot t ON p.event_type = t.event_type
    GROUP BY p.event_type, p.next_type
    """,
    "timeseries",
)
def events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current) — the behavioral model behind
    next-action prediction and anomaly scoring on clickstreams.

    Shape: one window pass (lead over user_id ordering, tie-broken on
    event_id for determinism) turns the stream into transition pairs;
    the matrix and its row totals are #event_types^2-sized aggregates.
    Each probability is one IEEE division of two exact counts — bit-equal
    cross-engine."""
    ev = load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
    )
    tot = pairs.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_from"))
    return (
        pairs.join(tot, "event_type")
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_trans"),
            (
                F.count(F.lit(1)).cast("double")
                / F.any_value("n_from").cast("double")
            ).alias("p_trans"),
        )
    )


@register(
    "events_hourly_anomaly",
    """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))),
    stats AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n_events) AS BIGINT) AS s,
               CAST(SUM(n_events * n_events) AS BIGINT) AS ss
        FROM hourly GROUP BY event_type)
    SELECT h.event_type, h.bucket, h.n_events,
           CAST(FLOOR(1e6 * ((CAST(h.n_events AS DOUBLE) - CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
                / sqrt(CAST(t.n * t.ss - t.s * t.s AS DOUBLE) / CAST(t.n * (t.n - 1) AS DOUBLE))))
                AS BIGINT) AS z_q6
    FROM hourly h JOIN stats t ON h.event_type = t.event_type
    WHERE t.n > 1 AND (t.n * t.ss - t.s * t.s) > 0
    """,
    "timeseries",
)
def events_hourly_anomaly(spark, sf_dir):
    """Per-type hourly volume anomaly scoring: each hour's event count as
    a z-score against that type's own hourly distribution — the
    monitoring primitive behind traffic-spike and outage detection.

    Cross-engine exactness without trusting stddev implementations: mean
    and variance come from exact integer sums (n, sum, sum-of-squares; the
    unbiased (n*ss - s*s)/(n*(n-1)) form), so the float work per row is a
    fixed sequence of single IEEE operations — identical in DuckDB — and
    the score is floor-quantized to 1e-6. Two vocabulary-sized
    aggregations, one broadcastable stats join."""
    ev = load(spark, sf_dir, "events")["events"]
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_events").cast("bigint").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("bigint").alias("ss"),
    )
    joined = hourly.join(F.broadcast(stats), "event_type").where(
        (F.col("n") > 1) & (F.col("n") * F.col("ss") - F.col("s") * F.col("s") > 0)
    )
    return joined.select(
        "event_type",
        "bucket",
        "n_events",
        F.expr(
            "CAST(FLOOR(1e6 * ((CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
            " / sqrt(CAST(n * ss - s * s AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))))"
            " AS BIGINT)"
        ).alias("z_q6"),
    )


# ---------------------------------------------------------------------------
# Round 10 — time-weighted average (the metering/billing aggregate): a
# point-in-time metric's average must weight each reading by how long it was
# the current one, not by reading count — the standard IoT / usage-metering
# rollup that plain AVG gets wrong whenever sampling is irregular.
# ---------------------------------------------------------------------------


@register(
    "events_time_weighted_avg",
    """
    WITH seg AS (
        SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_cents,
               CAST(date_diff('microsecond', CAST(ts AS TIMESTAMP),
                    LEAD(CAST(ts AS TIMESTAMP)) OVER (
                        PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
                        ORDER BY ts, event_id)) AS BIGINT) AS dur_us
        FROM events)
    SELECT user_id, day,
           CAST(COUNT(*) AS INT) AS n_segments,
           CAST(SUM(dur_us) AS BIGINT) AS total_us,
           CAST(SUM(v_cents * dur_us) AS BIGINT) AS weighted_q,
           CAST(CAST(SUM(v_cents * dur_us) AS BIGINT) AS DOUBLE)
               / (100.0 * CAST(SUM(dur_us) AS BIGINT)) AS twa_value
    FROM seg
    WHERE dur_us IS NOT NULL AND dur_us > 0
    GROUP BY user_id, day
    """,
    "timeseries",
)
def events_time_weighted_avg(spark, sf_dir):
    """Per (user, day) time-weighted average of ``value``: each reading is
    weighted by the microseconds until the next reading that day (LEAD
    over the event-time order; the day's last reading closes its
    interval, so it carries no weight — the convention that makes the
    metric a pure function of in-day data, restart-safe for incremental
    recomputation).

    Exactness: value has 2 decimals; floor(v*100 + 0.5) pins the cents
    to an exact BIGINT identically in both engines (a bare CAST
    truncates in Spark but rounds in DuckDB — 6.54*100 =
    653.999... diverges);
    durations are exact integer microseconds; the weighted sum is a
    BIGINT sum of BIGINT products (max |v_cents * dur_us| ~ 1e4 * 8.6e10
    per segment — int64 holds ~1e5 such segments per (user, day), audit
    before raising the grain); the TWA is one double division. LEAD
    orders by (ts, event_id) — a total order even under timestamp ties.

    Scale posture: one shuffle on (user_id, day) shared by the window
    and the aggregation; no self-join (the naive formulation joins
    events to next-events)."""
    ev = load(spark, sf_dir, "events")["events"]
    day = F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date")
    w = Window.partitionBy(
        "user_id", F.date_trunc("day", F.col("ts").cast("timestamp"))
    ).orderBy(F.col("ts"), F.col("event_id"))
    seg = ev.select(
        "user_id",
        day.alias("day"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("v_cents"),
        (
            F.unix_micros(F.lead(F.col("ts").cast("timestamp")).over(w))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("dur_us"),
    )
    return (
        seg.where(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
        .groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_segments"),
            F.sum("dur_us").cast("bigint").alias("total_us"),
            F.sum(F.col("v_cents") * F.col("dur_us"))
            .cast("bigint")
            .alias("weighted_q"),
            (
                F.sum(F.col("v_cents") * F.col("dur_us")).cast("bigint").cast("double")
                / (F.lit(100.0) * F.sum("dur_us").cast("bigint"))
            ).alias("twa_value"),
        )
    )


@register(
    "orders_cohort_ltv",
    """
    WITH firsts AS (
        SELECT o_custkey,
               CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS cohort
        FROM orders GROUP BY o_custkey),
    o AS (
        SELECT f.cohort,
               CAST((EXTRACT(year FROM o.o_orderdate) - EXTRACT(year FROM f.cohort)) * 12
                    + (EXTRACT(month FROM o.o_orderdate) - EXTRACT(month FROM f.cohort))
                    AS INT) AS offset_m,
               o.o_custkey,
               CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey),
    cell AS (
        SELECT cohort, offset_m,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_active,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM o GROUP BY cohort, offset_m)
    SELECT cohort, offset_m, n_active, revenue_cents,
           CAST(SUM(revenue_cents) OVER (PARTITION BY cohort ORDER BY offset_m)
                AS BIGINT) AS cum_revenue_cents
    FROM cell
    """,
    "timeseries",
    "analytics",
)
def orders_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value triangle: customers cohorted by first-order
    month; per (cohort, month offset) the active-customer count, exact-
    cents revenue, and the cumulative LTV running sum — the standard
    retention-revenue report (`retention_cohorts` counts users; this
    follows the money).

    Exactness: month offsets are integer calendar arithmetic (no
    datediff-in-days ambiguity); cents pinned with FLOOR(x*100 + 0.5);
    the cumulative sum is a BIGINT window over exact cell sums, ordered
    by the (unique per cohort) offset.

    Scale posture: firsts is one groupBy over orders; the cohort join
    shuffles on o_custkey (or broadcasts when the customer dim is small
    relative to the threshold); cells are #cohorts x #offsets rows and
    the running-sum window partitions by cohort — never global."""
    o = load(spark, sf_dir, "orders")["orders"]
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("cohort")
    )
    j = o.join(firsts, "o_custkey").select(
        "cohort",
        (
            (F.year("o_orderdate") - F.year("cohort")) * 12
            + (F.month("o_orderdate") - F.month("cohort"))
        )
        .cast("int")
        .alias("offset_m"),
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    cell = j.groupBy("cohort", "offset_m").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("n_active"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )
    w = Window.partitionBy("cohort").orderBy("offset_m")
    return cell.select(
        "cohort",
        "offset_m",
        "n_active",
        "revenue_cents",
        F.sum("revenue_cents").over(w).cast("bigint").alias("cum_revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Round 11 — robust (median/MAD) anomaly detection over daily rollups
# ---------------------------------------------------------------------------


@register(
    "events_anomaly_mad",
    """
    WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS v_cents
        FROM events GROUP BY 1, 2),
    med AS (
        SELECT user_id,
               quantile_cont(CAST(v_cents AS DOUBLE), 0.5) AS med
        FROM daily GROUP BY user_id),
    dev AS (
        SELECT d.user_id, d.day, d.v_cents, m.med,
               abs(d.v_cents - m.med) AS adev
        FROM daily d JOIN med m ON d.user_id = m.user_id),
    mad AS (
        SELECT user_id, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY user_id)
    SELECT dev.user_id, dev.day, dev.v_cents, dev.med, mad.mad,
           (dev.adev > 3 * mad.mad) AS is_anomaly
    FROM dev JOIN mad ON dev.user_id = mad.user_id
    """,
    "timeseries",
)
def events_anomaly_mad(spark, sf_dir):
    """Robust per-user anomaly flags over daily value rollups: a day is
    anomalous when its deviation from the user's MEDIAN daily total
    exceeds 3x the user's MAD (median absolute deviation) — the
    outlier-immune alternative to mean/stddev z-scores (one corrupt day
    cannot drag the threshold, unlike a moment-based score).

    Cross-engine exactness without libm: daily totals are floor-
    quantized BIGINT cents; both engines' continuous median of n exact
    ints is lower + (upper - lower) * 0.5 — an exact IEEE half of an
    exact integer gap — and the MAD stage interpolates exact halves the
    same way, so med/mad/flags are bit-identical (no stddev, no sqrt of
    a float sum, no rounding convention).

    Scale posture: the corpus-scale work is ONE shuffle to (user, day)
    grain; the daily and deviation frames are CACHED (scope_caches) so
    the med/MAD/flag stages reuse them instead of re-deriving the rollup
    from raw events four times (Catalyst does not CSE a repeated
    DataFrame subtree on its own — the plan gate pins the single scan).
    Medians and MADs run at user grain (exact percentile sorts over
    ~days-per-user rows) and both joins are at daily grain. At 100 TB
    the daily rollup is the stored incremental table
    (events_hourly_rollup's pattern) and this query never re-touches
    raw events."""
    from ..caching import scope_caches

    ev = load(spark, sf_dir, "events")["events"]
    daily = (
        ev.groupBy(
            "user_id",
            F.date_trunc("day", F.col("ts").cast("timestamp"))
            .cast("date")
            .alias("day"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("v_cents")
        )
        .cache()
    )
    med = daily.groupBy("user_id").agg(
        F.expr("percentile(CAST(v_cents AS DOUBLE), 0.5D)").alias("med")
    )
    dev = (
        daily.join(med, "user_id")
        .withColumn("adev", F.abs(F.col("v_cents") - F.col("med")))
        .cache()
    )
    mad = dev.groupBy("user_id").agg(
        F.expr("percentile(adev, 0.5D)").alias("mad")
    )
    out = dev.join(mad, "user_id").select(
        "user_id",
        "day",
        "v_cents",
        "med",
        "mad",
        (F.col("adev") > 3 * F.col("mad")).alias("is_anomaly"),
    )
    return scope_caches(out, daily, dev)


# ---------------------------------------------------------------------------
# Round 11 — CUSUM drift detection over daily rollups
# ---------------------------------------------------------------------------

#: alarm when the one-sided CUSUM exceeds this multiple of the user's
#: grand daily total (scaled integer compare — see docstring)
_CUSUM_K = 2


@register(
    "events_cusum_drift",
    f"""
    WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS v_cents
        FROM events GROUP BY 1, 2),
    stats AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(v_cents) AS BIGINT) AS total
        FROM daily GROUP BY user_id),
    scaled AS (
        SELECT d.user_id, d.day,
               n_days * d.v_cents - total AS dev_scaled, total
        FROM daily d JOIN stats s ON d.user_id = s.user_id),
    runsum AS (
        SELECT user_id, day, total,
               SUM(dev_scaled) OVER (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_t
        FROM scaled),
    cusum AS (
        SELECT user_id, day, total, s_t,
               s_t - MIN(s_t) OVER (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d_t
        FROM runsum)
    SELECT user_id, day, CAST(s_t AS BIGINT) AS s_t,
           CAST(d_t AS BIGINT) AS d_t,
           (d_t > {_CUSUM_K} * total) AS drift_alarm
    FROM cusum
    """,
    "timeseries",
)
def events_cusum_drift(spark, sf_dir):
    """One-sided CUSUM drift detector per user over daily value rollups
    (Page 1954): S_t = running sum of mean-centered daily totals,
    D_t = S_t - min(S_1..t) — the classic "how far above its running
    minimum has the cumulative deviation climbed" statistic that fires
    on sustained upward level shifts long before any single day looks
    anomalous (the complement of events_anomaly_mad's pointwise flags).

    Exactness: the mean-centered deviation is kept INTEGER by scaling
    through the day count — dev_scaled = n_days * v_cents - total (both
    BIGINT) — so prefix sums, running minima, and the alarm comparison
    (D_t > {_CUSUM_K} * n_days * mean_daily == {_CUSUM_K} * total) are
    pure int64 arithmetic in both engines; no float appears anywhere.
    Magnitudes: |dev_scaled| <= n_days * max_daily_cents (~1e9 at sf1),
    prefix-summed over <= n_days rows (~1e11) — five orders inside
    int64 even at 100x.

    Scale posture: one corpus shuffle to (user, day); the stats join
    and both windows run on the daily frame partitioned by user (the
    two windows share one (user_id, day-order) sort)."""
    ev = load(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(
        "user_id",
        F.date_trunc("day", F.col("ts").cast("timestamp"))
        .cast("date")
        .alias("day"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("v_cents")
    )
    stats = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("v_cents").cast("bigint").alias("total"),
    )
    scaled = daily.join(stats, "user_id").select(
        "user_id",
        "day",
        (F.col("n_days") * F.col("v_cents") - F.col("total")).alias(
            "dev_scaled"
        ),
        "total",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runsum = scaled.withColumn("s_t", F.sum("dev_scaled").over(w))
    cusum = runsum.withColumn("d_t", F.col("s_t") - F.min("s_t").over(w))
    return cusum.select(
        "user_id",
        "day",
        F.col("s_t").cast("bigint").alias("s_t"),
        F.col("d_t").cast("bigint").alias("d_t"),
        (F.col("d_t") > _CUSUM_K * F.col("total")).alias("drift_alarm"),
    )


# ---------------------------------------------------------------------------
# Round 13 — exact half-life decayed engagement scores
# ---------------------------------------------------------------------------

_DECAY_HALF_LIFE_US = 7 * 86_400 * 1_000_000  # one week, in microseconds

_DECAY_SQL = f"""
    WITH ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    ref AS (SELECT MAX(epoch_us(ts)) AS now_us FROM ev),
    t AS (
        SELECT user_id,
               epoch_us(ts) AS ts_us,
               GREATEST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT),
                        CAST(0 AS BIGINT)) AS cents,
               CAST(((SELECT now_us FROM ref) - epoch_us(ts))
                    // {_DECAY_HALF_LIFE_US} AS BIGINT) AS k
        FROM ev)
    SELECT user_id,
           CAST(SUM(cents // (CAST(1 AS BIGINT) << CAST(LEAST(k, 62) AS INT)))
                AS BIGINT) AS decay_score,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(ts_us) AS BIGINT) AS last_seen_us
    FROM t GROUP BY user_id
"""


@register(
    "events_decay_engagement",
    _DECAY_SQL,
    "timeseries",
)
def events_decay_engagement(spark, sf_dir):
    """Half-life-decayed engagement scoring: each event's value counts at
    2^-(age/half_life) of face value (one-week half-life) — the standard
    recency weighting behind freshness-aware user/feature scores and
    trending rankings. The decay is EXACT integer arithmetic end to end:
    age bucket k = floor(age_us / half_life_us), contribution =
    cents >> k (integer divide by a power of two) — no exp()/pow()
    float, so both engines agree bit-for-bit and the sum is
    order-independent. `value` is non-negative in this schema, and the
    explicit GREATEST(cents, 0) clamp makes that a contract: integer
    division of NEGATIVES is the truncate-vs-floor cross-engine trap
    (Spark DIV truncates toward zero, DuckDB // floors), and a future
    driver data regeneration must not be able to re-open it silently.
    The bucket is clamped with LEAST(k, 62) in BOTH dialects: an
    unclamped 1<<63 raises OutOfRangeException in DuckDB while Spark's
    shiftleft masks the count mod 64 (Java semantics) and would silently
    count a 64-half-life-old event at FULL face value. The clamp is
    exact — cents < 2^62, so any k >= 62 contributes 0 either way.

    100 TB posture: ONE map-side-combinable groupBy(user_id) over a
    row-local projection — the same single-exchange shape as
    stream_user_totals' batch twin; the reference instant is one
    driver-side MAX scalar (the kcore/colbert bounded-scalar
    convention), so every row's bucket is a literal comparison. A
    production variant holds `now` fixed per run for idempotent
    re-scoring — exactly what this form does.
    """
    ev = load(spark, sf_dir, "events")["events"].select("user_id", "ts", "value")
    now_us = ev.agg(F.max(F.unix_micros("ts")).alias("m")).collect()[0].m
    t = ev.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.expr(
            "GREATEST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT),"
            " CAST(0 AS BIGINT))"
        ).alias("cents"),
        F.expr(
            f"CAST(({now_us} - unix_micros(ts)) DIV {_DECAY_HALF_LIFE_US}"
            " AS BIGINT)"
        ).alias("k"),
    )
    return t.groupBy("user_id").agg(
        F.expr(
            "CAST(SUM(cents DIV shiftleft(CAST(1 AS BIGINT),"
            " CAST(LEAST(k, CAST(62 AS BIGINT)) AS INT))) AS BIGINT)"
        ).alias("decay_score"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("ts_us").cast("bigint").alias("last_seen_us"),
    )
