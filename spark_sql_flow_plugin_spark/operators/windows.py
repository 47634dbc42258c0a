"""Window-function battery (SURVEY.md §2.D "Window functions";
reference corpus /root/reference/src/test/resources/sql-flow-tests/inputs/window.sql).

Covers ranking (row_number/rank/dense_rank/percent_rank/cume_dist/ntile),
running and bounded ROWS frames, RANGE frames over numeric and timestamp
(interval bounds), lead/lag, first/last_value with IGNORE NULLS, empty
OVER (), statistical window aggregates, and ordered collect_list.

Determinism: every ordered window orders by a unique key (tie-break cols
included); accumulating sums go through DECIMAL so partition order can't
change the result.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load

# (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem;
# adding l_extendedprice makes the sort key unique at every SF, which is what
# keeps ROW_NUMBER/accumulating frames deterministic across engines.
_LI_KEY = ["l_orderkey", "l_linenumber", "l_extendedprice"]


@register(
    "win_ranking",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag,
           ROW_NUMBER()   OVER w AS rn,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           NTILE(4)       OVER w AS tile
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_orderkey, l_linenumber, l_extendedprice)
    """,
    "window",
    "bench",
)
def win_ranking(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    w = Window.partitionBy("l_returnflag").orderBy(*_LI_KEY)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("tile"),
    )


@register(
    "win_percent_cume",
    """
    SELECT o_orderkey, o_orderpriority,
           ROUND(PERCENT_RANK() OVER w, 8) AS prnk,
           ROUND(CUME_DIST()    OVER w, 8) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
    """,
    "window",
)
def win_percent_cume(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 8).alias("prnk"),
        F.round(F.cume_dist().over(w), 8).alias("cdist"),
    )


@register(
    "win_running_sum",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER w AS DOUBLE) AS run_qty,
           COUNT(*) OVER w AS run_n
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_orderkey, l_linenumber, l_extendedprice
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "window",
)
def win_running_sum(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy(*_LI_KEY)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).over(w).cast("double").alias("run_qty"),
        F.count("*").over(w).alias("run_n"),
    )


@register(
    "win_rows_bounded",
    """
    SELECT l_orderkey, l_linenumber,
           MIN(l_quantity) OVER w AS min_q,
           MAX(l_quantity) OVER w AS max_q,
           COUNT(*)        OVER w AS n_in_frame
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber, l_extendedprice
                 ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING)
    """,
    "window",
)
def win_rows_bounded(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    w = Window.partitionBy("l_suppkey").orderBy(*_LI_KEY).rowsBetween(-2, 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.min("l_quantity").over(w).alias("min_q"),
        F.max("l_quantity").over(w).alias("max_q"),
        F.count("*").over(w).alias("n_in_frame"),
    )


@register(
    "win_range_numeric",
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           COUNT(*) OVER w AS n_similar,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS price_in_range
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity
                 RANGE BETWEEN 5.0 PRECEDING AND CURRENT ROW)
    """,
    "window",
)
def win_range_numeric(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity").rangeBetween(-5, 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.count("*").over(w).alias("n_similar"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("price_in_range"),
    )


@register(
    "win_range_interval",
    """
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS val_last_hour
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events) ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    "window",
)
def win_range_interval(spark, sf_dir):
    ev = load(spark, sf_dir, "events")["events"]
    ev.createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               COUNT(*) OVER w AS n_last_hour,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS val_last_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


@register(
    "win_lead_lag",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice, 1)  OVER w AS prev_price,
           LEAD(o_totalprice, 1, -1.0) OVER w AS next_price,
           LAG(o_totalprice, 2, 0.0)   OVER w AS prev2_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "window",
)
def win_lead_lag(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1, -1.0).over(w).alias("next_price"),
        F.lag("o_totalprice", 2, 0.0).over(w).alias("prev2_price"),
    )


@register(
    "win_first_last",
    """
    SELECT l_orderkey, l_linenumber,
           FIRST_VALUE(nullable_qty IGNORE NULLS) OVER w AS first_nn,
           LAST_VALUE(nullable_qty IGNORE NULLS)  OVER w AS last_nn
    FROM (SELECT l_orderkey, l_linenumber, l_extendedprice, l_suppkey,
                 CASE WHEN l_discount < 0.01 THEN NULL ELSE l_quantity END AS nullable_qty
          FROM lineitem)
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber, l_extendedprice
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "window",
)
def win_first_last(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    base = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_suppkey",
        F.when(F.col("l_discount") < 0.01, None).otherwise(F.col("l_quantity")).alias(
            "nullable_qty"
        ),
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(*_LI_KEY)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        "l_orderkey",
        "l_linenumber",
        F.first("nullable_qty", ignorenulls=True).over(w).alias("first_nn"),
        F.last("nullable_qty", ignorenulls=True).over(w).alias("last_nn"),
    )


@register(
    "win_empty_over",
    """
    SELECT o_orderkey, o_totalprice,
           COUNT(*) OVER () AS n_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER () AS DOUBLE) AS sum_total
    FROM orders WHERE o_totalprice > 9800
    """,
    "window",
)
def win_empty_over(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy()
    return o.where(F.col("o_totalprice") > 9800).select(
        "o_orderkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_total"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double").alias(
            "sum_total"
        ),
    )


@register(
    "win_stats",
    """
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 6) + 0.0 AS sd_qty,
           ROUND(VAR_POP(l_quantity), 6) + 0.0 AS var_qty,
           ROUND(COVAR_POP(l_quantity, l_discount), 6) + 0.0 AS cov_qd,
           ROUND(CORR(l_quantity, l_discount), 6) + 0.0 AS corr_qd
    FROM lineitem GROUP BY l_returnflag
    """,
    "window",
)
def win_stats(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    # the `+ 0.0` normalizes IEEE -0.0 (which ROUND can produce) to +0.0 in
    # both engines, so the value-hash compare can't be tripped by sign-of-zero
    return li.groupBy("l_returnflag").agg(
        (F.round(F.stddev_samp("l_quantity"), 6) + 0.0).alias("sd_qty"),
        (F.round(F.var_pop("l_quantity"), 6) + 0.0).alias("var_qty"),
        (F.round(F.covar_pop("l_quantity", "l_discount"), 6) + 0.0).alias("cov_qd"),
        (F.round(F.corr("l_quantity", "l_discount"), 6) + 0.0).alias("corr_qd"),
    )


@register(
    "agg_skew_kurt",
    """
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*) AS mu
      FROM lineitem GROUP BY l_returnflag
    ), c AS (
      SELECT l.l_returnflag, m.n, m.mu,
             SUM(POW(l.l_quantity - m.mu, 2)) AS m2,
             SUM(POW(l.l_quantity - m.mu, 3)) AS m3,
             SUM(POW(l.l_quantity - m.mu, 4)) AS m4
      FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
      GROUP BY l.l_returnflag, m.n, m.mu
    )
    SELECT l_returnflag,
           ROUND((m3 / n) / POW(m2 / n, 1.5), 4) + 0.0 AS skew_qty,
           ROUND((m4 / n) / POW(m2 / n, 2) - 3.0, 4) + 0.0 AS kurt_qty
    FROM c
    """,
    "aggregate",
)
def agg_skew_kurt(spark, sf_dir):
    # Spark's skewness/kurtosis are *population* moments; DuckDB's builtins are
    # sample-corrected, so the oracle recomputes Spark's definition from raw
    # central moments. Round(4) absorbs accumulation-order FP noise.
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        (F.round(F.skewness("l_quantity"), 4) + 0.0).alias("skew_qty"),
        (F.round(F.kurtosis("l_quantity"), 4) + 0.0).alias("kurt_qty"),
    )


@register(
    "win_collect_list",
    """
    SELECT l_orderkey, l_linenumber,
           array_to_string(list(l_linenumber) OVER w, ',') AS lines_so_far
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "window",
)
def win_collect_list(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.array_join(F.collect_list("l_linenumber").over(w), ",").alias("lines_so_far"),
    )
