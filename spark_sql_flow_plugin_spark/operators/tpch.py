"""Flagship analytics: TPC-H-shaped multi-join aggregate queries plus
time-series rollups over the events table. These are the bench headliners —
each is written so Catalyst produces the plan you'd want at 100 TB:
filters before joins (pushdown into the parquet scan), tiny dims broadcast,
partial aggregation before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.exprs import SQL_DAVG, SQL_DSUM, SQL_REVENUE, davg, dsum, revenue
from ..registry import register
from ..sources import load, register_views


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {SQL_DSUM.format(x='l_quantity')} AS sum_qty,
           {SQL_DSUM.format(x='l_extendedprice')} AS sum_base_price,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS sum_disc_price,
           {SQL_DAVG.format(x='l_quantity')} AS avg_qty,
           {SQL_DAVG.format(x='l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    "tpch",
    "bench",
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: single scan → partial agg → final agg; no joins."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(revenue()).cast("double").alias("sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "tpch",
    "bench",
)
def q3_shipping_priority(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        t["customer"]
        .where(F.col("c_mktsegment") == "BUILDING")
        .join(
            t["orders"].where(
                F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            t["lineitem"].where(
                F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name, CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    "tpch",
    "bench",
)
def q5_local_supplier_volume(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            broadcast(t["region"].where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    "tpch",
    "bench",
)
def q6_forecast_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "tpch",
    "subquery",
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS (Catalyst → semi join) + group."""
    register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name AND n1.n_regionkey = n2.n_regionkey
    GROUP BY n1.n_name, n2.n_name
    """,
    "tpch",
    "join",
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: the nation dim joined twice (supplier side + customer
    side) — a same-table self-join of a broadcast dim."""
    t = load(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"),
        F.col("n_regionkey").alias("n2_region"),
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            (F.col("supp_nation") != F.col("cust_nation"))
            & (F.col("n1_region") == F.col("n2_region"))
        )
        .groupBy("supp_nation", "cust_nation")
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
    )


@register(
    "q12_priority_bands",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_quantity > 25
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "tpch",
)
def q12_priority_bands(spark, sf_dir):
    """TPC-H Q12 shape: join + CASE/FILTER band counting."""
    t = load(spark, sf_dir, "orders", "lineitem")
    return (
        t["orders"]
        .join(
            t["lineitem"].where(F.col("l_quantity") > 25),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.expr(
                "COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))"
            ).alias("high_line_count"),
            F.expr(
                "COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))"
            ).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "events_hourly_rollup",
    f"""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket, event_type,
           COUNT(*) AS n_events,
           {SQL_DSUM.format(x='value')} AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type
    """,
    "timeseries",
    "bench",
)
def events_hourly_rollup(spark, sf_dir):
    ev = load(spark, sf_dir, "events")["events"]
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        dsum("value", "sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "events_top_users",
    f"""
    SELECT event_type, user_id, sum_value, rnk FROM (
        SELECT event_type, user_id,
               {SQL_DSUM.format(x='value')} AS sum_value,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY {SQL_DSUM.format(x='value')} DESC, user_id) AS INT) AS rnk
        FROM events GROUP BY event_type, user_id) t
    WHERE rnk <= 3
    """,
    "timeseries",
)
def events_top_users(spark, sf_dir):
    ev = load(spark, sf_dir, "events")["events"]
    per_user = ev.groupBy("event_type", "user_id").agg(dsum("value", "sum_value"))
    w = Window.partitionBy("event_type").orderBy(F.col("sum_value").desc(), "user_id")
    return (
        per_user.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("event_type", "user_id", "sum_value", "rnk")
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "tpch",
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: fact-fact join narrowed by a date slice, tiny dim
    broadcast, top-k via TakeOrderedAndProject (never a global sort)."""
    t = load(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .where(
            (F.col("l_returnflag") == "R")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_effect",
    f"""
    SELECT CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_REVENUE}
                                 ELSE CAST(0 AS DECIMAL(18,4)) END)
                / SUM({SQL_REVENUE}) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
    "tpch",
)
def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregate over a filtered fact-dim join
    (part broadcasts at any SF where it fits; the date filter pushes to the
    lineitem scan)."""
    t = load(spark, sf_dir, "lineitem", "part")
    promo = F.when(F.col("p_type") == "PROMO", revenue()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
        )
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(revenue()).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q19_disjunctive_predicates",
    f"""
    SELECT CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#21' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    "tpch",
)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-conjunctions spanning both join sides. The
    single common conjunct (the equi-key) keeps this a hash join; Catalyst
    pushes the disjunction's single-side residuals (p_brand IN (...),
    l_quantity range) below the join as derived filters."""
    t = load(spark, sf_dir, "lineitem", "part")
    cond = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#21")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#22")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
    )


@register(
    "q22_global_sales_opportunity",
    f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_cust,
           {SQL_DSUM.format(x='c_acctbal')} AS total_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
    GROUP BY c_mktsegment
    """,
    "tpch",
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: scalar-average subquery gate + anti join against the
    fact table, grouped rollup of who's left (c_mktsegment substitutes for
    the spec's phone prefix — the synthetic schema carries no phone; the
    anti-join is against *whale orders* because this generator gives every
    customer some order, making a bare NOT EXISTS vacuous)."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        f"""
        SELECT c_mktsegment,
               COUNT(*) AS n_cust,
               {SQL_DSUM.format(x='c_acctbal')} AS total_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        GROUP BY c_mktsegment
        """
    )
