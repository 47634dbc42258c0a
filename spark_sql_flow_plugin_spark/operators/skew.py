"""Skew-handling operators: salted two-phase aggregation and a salted
high-cardinality distinct count.

At 100 TB a handful of hot keys (one viral document source, one dominant
user) can pin a single reducer for hours. AQE's skew-join splitting handles
joins; for aggregations the classic fix is salting: shard each key into
``key × salt`` for the partial aggregate (spreading the hot key over N
reducers), then combine partials in a second, tiny aggregate. The result is
identical to a direct groupBy — which is exactly what the DuckDB oracle
verifies.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.exprs import SQL_DSUM
from ..registry import register
from ..sources import load

_N_SALTS = 16


@register(
    "salted_agg_by_type",
    f"""
    SELECT event_type, COUNT(*) AS n_events,
           {SQL_DSUM.format(x='value')} AS sum_value
    FROM events GROUP BY event_type
    """,
    "skew",
)
def salted_agg_by_type(spark, sf_dir):
    """event_type has only 5 values — a worst-case skew shape for a direct
    groupBy at scale. Phase 1 aggregates (event_type, salt) partials across
    16× more reducers; phase 2 combines 5×16 tiny rows."""
    ev = load(spark, sf_dir, "events")["events"]
    partial = (
        ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(_N_SALTS)))
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("n_part"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_part"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("n_part").alias("n_events"),
        F.sum("sum_part").cast("double").alias("sum_value"),
    )


@register(
    "salted_join_events_users",
    f"""
    WITH user_cat AS (
        SELECT user_id, CASE WHEN user_id % 3 = 0 THEN 'power' ELSE 'casual' END AS category
        FROM (SELECT DISTINCT user_id FROM events))
    SELECT category, COUNT(*) AS n_events, {SQL_DSUM.format(x='value')} AS sum_value
    FROM events JOIN user_cat USING (user_id)
    GROUP BY category
    """,
    "skew",
    "join",
)
def salted_join_events_users(spark, sf_dir):
    """Salted skew join: the fact side's hot keys are salted, the dimension
    side is exploded across all salt values, and the join key becomes
    (user_id, salt) — a hot user's rows now spread over 16 reducers. The
    oracle verifies the result is identical to the plain join."""
    ev = load(spark, sf_dir, "events")["events"]
    users = (
        ev.select("user_id")
        .distinct()
        .withColumn(
            "category",
            F.when(F.col("user_id") % 3 == 0, "power").otherwise("casual"),
        )
    )
    fact = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(_N_SALTS)))
    dim = users.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_N_SALTS - 1)))
    )
    return (
        fact.join(dim, ["user_id", "salt"])
        .groupBy("category")
        .agg(F.count("*").alias("n_events"), F.sum(
            F.col("value").cast("decimal(18,4)")
        ).cast("double").alias("sum_value"))
    )


@register(
    "salted_distinct_users",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    "skew",
)
def salted_distinct_users(spark, sf_dir):
    """COUNT(DISTINCT) under skew: dedup on (key, salt-by-value) first —
    each distinct value lands on exactly one salt shard, so the shard
    counts sum to the true distinct count."""
    ev = load(spark, sf_dir, "events")["events"]
    sharded = (
        ev.withColumn("salt", F.pmod(F.col("user_id"), F.lit(_N_SALTS)))
        .select("event_type", "salt", "user_id")
        .dropDuplicates(["event_type", "salt", "user_id"])
    )
    per_shard = sharded.groupBy("event_type", "salt").agg(
        F.count("*").alias("n_part")
    )
    return per_shard.groupBy("event_type").agg(F.sum("n_part").alias("n_users"))
