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
    SELECT CAST(100.0 AS DOUBLE)
           * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_REVENUE}
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS promo_revenue_pct
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


# ---------------------------------------------------------------------------
# Round-4 additions: the remaining TPC-H query shapes. The synthetic schema
# carries no partsupp table, no comment columns, and no commit/receipt dates,
# so Q2/Q9/Q11/Q16/Q20 substitute the lineitem part↔supplier association for
# partsupp and Q21 defines "late" as shipping >60 days after the order date —
# each keeps the original query's plan shape (the thing being tested):
# correlated scalars, HAVING subqueries, null-aware NOT IN, EXISTS/NOT EXISTS
# pairs, conditional market-share aggregation.
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    """
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM part, supplier, lineitem, nation, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND p_size = 10
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND s_acctbal = (
          SELECT MIN(s2.s_acctbal)
          FROM supplier s2, lineitem l2, nation n2, region r2
          WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
            AND s2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
    """,
    "tpch",
    "subquery",
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: correlated MIN subquery selecting the best supplier
    per part (s_acctbal stands in for ps_supplycost; the lineitem
    association stands in for partsupp). Catalyst decorrelates the scalar
    subquery into an aggregate + join on the correlation key."""
    register_views(spark, sf_dir, "part", "supplier", "lineitem", "nation", "region")
    return spark.sql(
        """
        SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_brand
        FROM part, supplier, lineitem, nation, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND p_size = 10
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND s_acctbal = (
              SELECT MIN(s2.s_acctbal)
              FROM supplier s2, lineitem l2, nation n2, region r2
              WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
                AND s2.s_nationkey = n2.n_nationkey
                AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        """
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
               CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS volume,
               n2.n_name AS nation
        FROM part, supplier, lineitem, orders, customer,
             nation n1, nation n2, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
          AND p_type = 'ECONOMY') all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    "tpch",
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: national market share — an 8-table join with the
    nation dim appearing twice (customer region gate vs supplier nation
    attribution) feeding a conditional-share aggregation. Dims broadcast;
    the two fact joins shuffle on their keys."""
    t = load(
        spark, sf_dir, "part", "supplier", "lineitem", "orders", "customer",
        "nation", "region",
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    volume = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    all_nations = (
        t["lineitem"]
        .join(broadcast(t["part"].where(F.col("p_type") == "ECONOMY")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            broadcast(t["region"].where(F.col("r_name") == "ASIA")),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
    )
    share = F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        all_nations.groupBy("o_year")
        .agg(
            (
                F.sum(share).cast("double") / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_type_profit",
    """
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
               CAST(l_extendedprice * (1.0 - l_discount)
                    - p_retailprice * l_quantity * 0.1 AS DECIMAL(18,4)) AS amount
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%widget%') profit
    GROUP BY nation, o_year
    """,
    "tpch",
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by nation and year. ps_supplycost doesn't
    exist in this schema, so cost ≈ 10% of p_retailprice per unit — the
    arithmetic shape (per-row margin expression summed per group) is what
    matters. The p_name LIKE filter prunes the broadcast part dim before
    the join."""
    t = load(spark, sf_dir, "part", "supplier", "lineitem", "orders", "nation")
    amount = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    ).cast("decimal(18,4)")
    return (
        t["lineitem"]
        .join(
            broadcast(t["part"].where(F.col("p_name").like("%widget%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_part_value",
    """
    WITH natl AS (
        SELECT l_partkey,
               CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS val
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_3')
    SELECT l_partkey AS partkey, CAST(SUM(val) AS DOUBLE) AS value
    FROM natl
    GROUP BY l_partkey
    HAVING CAST(SUM(val) AS DOUBLE)
           > (SELECT 1.1 * (CAST(SUM(val) AS DOUBLE) / COUNT(DISTINCT l_partkey))
              FROM natl)
    """,
    "tpch",
    "subquery",
)
def q11_important_part_value(spark, sf_dir):
    """TPC-H Q11 shape: per-part value within one nation, kept only when it
    exceeds 1.1x the mean per-part value — a scalar subquery gating
    HAVING (the spec's fraction-of-national-total gate is vacuous on this
    uniform synthetic corpus, so the threshold is relative to the mean;
    the scalar joins back as a single broadcast row either way)."""
    register_views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(
        """
        WITH natl AS (
            SELECT l_partkey,
                   CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS val
            FROM lineitem, supplier, nation
            WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_name = 'NATION_3')
        SELECT l_partkey AS partkey, CAST(SUM(val) AS DOUBLE) AS value
        FROM natl
        GROUP BY l_partkey
        HAVING CAST(SUM(val) AS DOUBLE)
               > (SELECT 1.1 * (CAST(SUM(val) AS DOUBLE) / COUNT(DISTINCT l_partkey))
              FROM natl)
        """
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    "tpch",
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: customer order-count histogram — a left outer join
    with an extra join-side predicate (priority stands in for the spec's
    comment filter), then two stacked aggregations. COUNT(o_orderkey)
    counts 0 for match-less customers, which the histogram must keep."""
    t = load(spark, sf_dir, "customer", "orders")
    c_orders = (
        t["customer"]
        .join(
            t["orders"].where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {SQL_DSUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    "tpch",
    "subquery",
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: revenue view reused twice — once as the join input,
    once inside a scalar MAX subquery. The decimal sum keeps the equality
    comparison exact across engines (a double sum would make
    `total_revenue = MAX(...)` order-dependent)."""
    register_views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {SQL_DSUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        """
    )


@register(
    "q16_supplier_cnt",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "tpch",
    "subquery",
)
def q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per part class with a
    null-aware NOT IN exclusion subquery (Catalyst plans it as a
    null-aware anti join; the lineitem association stands in for
    partsupp)."""
    register_views(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type NOT IN ('PROMO', 'ECONOMY')
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    "tpch",
    "subquery",
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated per-part average gating the outer rows
    (decorrelates to an aggregate on l_partkey joined back). l_quantity is
    integer-valued, so AVG is an exact-integer sum over a count — the 0.2×
    threshold compares identically in both engines."""
    register_views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3'
          AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        """
    )


@register(
    "q18_large_volume_customer",
    f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {SQL_DSUM.format(x='l_quantity')} AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    "tpch",
    "subquery",
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery on the same fact
    (planned as a semi join of lineitem against its own aggregate), then
    top-k by order value via TakeOrderedAndProject."""
    register_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        f"""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               {SQL_DSUM.format(x='l_quantity')} AS sum_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
        """
    )


@register(
    "q20_potential_promotion",
    """
    WITH shipped AS (
        SELECT l_suppkey, l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey),
    part_total AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS tot
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_partkey)
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_12'
      AND s_suppkey IN (
          SELECT shipped.l_suppkey
          FROM shipped
          JOIN part_total ON shipped.l_partkey = part_total.l_partkey
          JOIN part ON p_partkey = shipped.l_partkey
          WHERE p_type = 'PROMO' AND shipped.qty > 0.2 * part_total.tot)
    ORDER BY s_name
    """,
    "tpch",
    "subquery",
)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape: suppliers holding a disproportionate share of a
    promoted part's shipments — an IN subquery over two aggregates of the
    same fact slice joined on the part key (the spec's correlated
    half-of-stock predicate, decorrelated explicitly; lineitem stands in
    for partsupp availability)."""
    register_views(spark, sf_dir, "lineitem", "supplier", "nation", "part")
    return spark.sql(
        """
        WITH shipped AS (
            SELECT l_suppkey, l_partkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_suppkey, l_partkey),
        part_total AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS tot
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_partkey)
        SELECT s_name, s_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_12'
          AND s_suppkey IN (
              SELECT shipped.l_suppkey
              FROM shipped
              JOIN part_total ON shipped.l_partkey = part_total.l_partkey
              JOIN part ON p_partkey = shipped.l_partkey
              WHERE p_type = 'PROMO' AND shipped.qty > 0.2 * part_total.tot)
        ORDER BY s_name
        """
    )


@register(
    "q21_suppliers_kept_waiting",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    "tpch",
    "subquery",
)
def q21_suppliers_kept_waiting(spark, sf_dir):
    """TPC-H Q21 shape: the only supplier late on a multi-supplier order —
    an EXISTS plus a NOT EXISTS against the same fact, both correlated on
    the order key (semi + anti join after decorrelation). "Late" is
    shipping >60 days after the order date (this schema has no
    commit/receipt dates)."""
    register_views(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        """
    )
