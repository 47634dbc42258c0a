"""Core relational surface: project/filter, joins (all 8 types), aggregation,
grouping analytics (CUBE/ROLLUP/GROUPING SETS), sort/limit, set operations.

Reference query surface: SURVEY.md §2.D rows "Projection/filter", "Joins",
"Aggregation", "Grouping analytics", "Sorts/limits", "Set ops"
(/root/reference/src/test/resources/sql-flow-tests/inputs/{basics,joins,
group-by,group-by-filter,group-analytics,set-operations}.sql).

Scale notes: nation/region joins are broadcast (25 / 5 rows at every SF);
fact-fact set ops shuffle on their full row which AQE coalesces; every
builder keeps filters before joins so Catalyst pushes them into the scan.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F
from pyspark.sql.functions import broadcast

from ..functions.exprs import SQL_DAVG, SQL_DSUM, davg, dsum
from ..registry import register
from ..sources import load, register_views


@register(
    "project_filter_cast",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(l_quantity) AS INT) AS qty_int,
           CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS net_price,
           UPPER(l_returnflag) AS flag_upper
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount < 0.05
    """,
    "projection",
)
def project_filter_cast(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.where((F.col("l_quantity") > 30) & (F.col("l_discount") < 0.05)).select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_quantity").cast("int").alias("qty_int"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("net_price"),
        F.upper("l_returnflag").alias("flag_upper"),
    )


@register(
    "filter_compound",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE (o_orderstatus IN ('F','O') AND o_totalprice BETWEEN 1000 AND 5000
           AND o_orderpriority LIKE '1%')
       OR (o_custkey % 10 = 0 AND o_totalprice > 9000)
    """,
    "projection",
)
def filter_compound(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    return o.where(
        (
            F.col("o_orderstatus").isin("F", "O")
            & F.col("o_totalprice").between(1000, 5000)
            & F.col("o_orderpriority").like("1%")
        )
        | ((F.col("o_custkey") % 10 == 0) & (F.col("o_totalprice") > 9000))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "agg_groupby_having",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           {SQL_DSUM.format(x='l_quantity')} AS sum_qty,
           {SQL_DAVG.format(x='l_extendedprice')} AS avg_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 10
    """,
    "aggregate",
)
def agg_groupby_having(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            dsum("l_quantity", "sum_qty"),
            davg("l_extendedprice", "avg_price"),
        )
        .where(F.col("cnt") > 10)
    )


@register(
    "agg_count_distinct",
    f"""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(*) AS n_orders,
           {SQL_DSUM.format(x='o_totalprice')} AS sum_price
    FROM orders GROUP BY o_orderpriority
    """,
    "aggregate",
)
def agg_count_distinct(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count("*").alias("n_orders"),
        dsum("o_totalprice", "sum_price"),
    )


@register(
    "agg_filter_where",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           COUNT(*) AS n_all
    FROM lineitem GROUP BY l_returnflag
    """,
    "aggregate",
)
def agg_filter_where(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.expr("COUNT(*) FILTER (WHERE l_quantity > 25)").alias("n_heavy"),
        F.expr("COUNT(*) FILTER (WHERE l_discount > 0.05)").alias("n_discounted"),
        F.count("*").alias("n_all"),
    )


@register(
    "agg_min_by_max_by",
    """
    SELECT c_nationkey,
           min_by(c_name, c_acctbal) AS poorest,
           max_by(c_name, c_acctbal) AS richest,
           COUNT(*) AS n
    FROM customer GROUP BY c_nationkey
    """,
    "aggregate",
)
def agg_min_by_max_by(spark, sf_dir):
    c = load(spark, sf_dir, "customer")["customer"]
    return c.groupBy("c_nationkey").agg(
        F.expr("min_by(c_name, c_acctbal)").alias("poorest"),
        F.expr("max_by(c_name, c_acctbal)").alias("richest"),
        F.count("*").alias("n"),
    )


@register(
    "agg_struct_key",
    """
    SELECT l_returnflag AS rf, l_linestatus AS ls, COUNT(*) AS cnt
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "aggregate",
)
def agg_struct_key(spark, sf_dir):
    # Groups by a STRUCT key (exercises struct-typed grouping in the plan;
    # reference corpus: group-by.sql STRUCT keys) then flattens for the oracle.
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy(F.struct("l_returnflag", "l_linestatus").alias("k"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("k.l_returnflag").alias("rf"),
            F.col("k.l_linestatus").alias("ls"),
            "cnt",
        )
    )


@register(
    "agg_collect_set",
    """
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
           COUNT(DISTINCT c_mktsegment) AS n_segments
    FROM customer GROUP BY c_nationkey
    """,
    "aggregate",
)
def agg_collect_set(spark, sf_dir):
    c = load(spark, sf_dir, "customer")["customer"]
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias("segments"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
    )


@register(
    "cube_agg",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           {SQL_DSUM.format(x='l_quantity')} AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "grouping-analytics",
)
def cube_agg(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"), dsum("l_quantity", "sum_qty")
    )


@register(
    "rollup_agg",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           {SQL_DSUM.format(x='l_extendedprice')} AS sum_price
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "grouping-analytics",
)
def rollup_agg(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"), dsum("l_extendedprice", "sum_price")
    )


@register(
    "grouping_sets",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           {SQL_DSUM.format(x='l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
    "grouping-analytics",
)
def grouping_sets(spark, sf_dir):
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               {SQL_DSUM.format(x='l_quantity')} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@register(
    "grouping_id_sel",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS cnt
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "grouping-analytics",
)
def grouping_id_sel(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"), F.count("*").alias("cnt")
    )


# --- joins -----------------------------------------------------------------


@register(
    "join_inner",
    """
    SELECT c_custkey, c_name, n_name, r_name, c_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE c_acctbal > 1000
    """,
    "join",
)
def join_inner(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "nation", "region")
    # nation/region are tiny at every SF: explicit broadcast keeps this a
    # map-side join with zero shuffle of the customer fact table.
    return (
        t["customer"]
        .where(F.col("c_acctbal") > 1000)
        .join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "c_name", "n_name", "r_name", "c_acctbal")
    )


@register(
    "join_left_outer",
    """
    SELECT n_nationkey, n_name, COUNT(c_custkey) AS n_customers
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_nationkey, n_name
    """,
    "join",
)
def join_left_outer(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "nation")
    return (
        t["nation"]
        .join(t["customer"], F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


@register(
    "join_right_outer",
    """
    SELECT n_nationkey, n_name, COUNT(s_suppkey) AS n_suppliers
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_nationkey, n_name
    """,
    "join",
)
def join_right_outer(spark, sf_dir):
    t = load(spark, sf_dir, "supplier", "nation")
    return (
        t["supplier"]
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"), "right")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@register(
    "join_full_outer",
    """
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    "join",
)
def join_full_outer(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "supplier")
    c = t["customer"].groupBy(F.col("c_nationkey").alias("nk")).agg(F.count("*").alias("n_cust"))
    s = t["supplier"].groupBy(F.col("s_nationkey").alias("nk")).agg(F.count("*").alias("n_supp"))
    return c.join(s, c["nk"] == s["nk"], "full").select(
        F.coalesce(c["nk"], s["nk"]).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "join_left_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 9000)
    """,
    "join",
)
def join_left_semi(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "orders")
    big = t["orders"].where(F.col("o_totalprice") > 9000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


# Customers with no high-value order. The synthetic generator gives every
# customer ~10 orders, so the unfiltered anti join was empty below sf0.1
# (r12 verdict); o_totalprice > 450000 is ~4% of orders, leaving ~(0.96)^10
# ≈ 38-66% of customers surviving at every SF (probed: 57/150, 538/1500,
# 5518/15000).
@register(
    "join_left_anti",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
    """,
    "join",
)
def join_left_anti(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "orders")
    big = t["orders"].where(F.col("o_totalprice") > 450000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "join_cross",
    """
    SELECT r_name, st AS status
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS st FROM orders) s
    """,
    "join",
)
def join_cross(spark, sf_dir):
    t = load(spark, sf_dir, "region", "orders")
    statuses = t["orders"].select(F.col("o_orderstatus").alias("st")).distinct()
    return t["region"].crossJoin(statuses).select("r_name", F.col("st").alias("status"))


@register(
    "join_natural",
    """
    SELECT regionkey, n_name, r_name
    FROM (SELECT n_nationkey, n_name, n_regionkey AS regionkey FROM nation) a
    NATURAL JOIN (SELECT r_regionkey AS regionkey, r_name FROM region) b
    """,
    "join",
)
def join_natural(spark, sf_dir):
    register_views(spark, sf_dir, "nation", "region")
    return spark.sql(
        """
        SELECT regionkey, n_name, r_name
        FROM (SELECT n_nationkey, n_name, n_regionkey AS regionkey FROM nation) a
        NATURAL JOIN (SELECT r_regionkey AS regionkey, r_name FROM region) b
        """
    )


# --- sort / limit ----------------------------------------------------------


@register(
    "sort_limit",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """,
    "sort",
)
def sort_limit(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(20)
    )


@register(
    "sort_multi_nulls",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_totalprice > 9500
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
    """,
    "sort",
)
def sort_multi_nulls(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    return (
        o.where(F.col("o_totalprice") > 9500)
        .orderBy(F.col("o_orderstatus").asc(), F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


# --- set operations ---------------------------------------------------------


@register(
    "union_all",
    """
    SELECT l_orderkey AS okey, 'heavy' AS src FROM lineitem WHERE l_quantity > 45
    UNION ALL
    SELECT l_orderkey AS okey, 'cheap' AS src FROM lineitem WHERE l_extendedprice < 1500
    """,
    "setop",
)
def union_all(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    a = li.where(F.col("l_quantity") > 45).select(
        F.col("l_orderkey").alias("okey"), F.lit("heavy").alias("src")
    )
    b = li.where(F.col("l_extendedprice") < 1500).select(
        F.col("l_orderkey").alias("okey"), F.lit("cheap").alias("src")
    )
    return a.union(b)


@register(
    "union_distinct",
    """
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
    "setop",
)
def union_distinct(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "supplier")
    a = t["customer"].select(F.col("c_nationkey").alias("nk"))
    b = t["supplier"].select(F.col("s_nationkey").alias("nk"))
    return a.union(b).distinct()


@register(
    "union_by_name",
    """
    SELECT n_nationkey AS k, n_name AS name FROM nation
    UNION ALL
    SELECT r_regionkey AS k, r_name AS name FROM region
    """,
    "setop",
)
def union_by_name(spark, sf_dir):
    t = load(spark, sf_dir, "nation", "region")
    a = t["nation"].select(F.col("n_nationkey").alias("k"), F.col("n_name").alias("name"))
    # columns deliberately reordered: unionByName aligns by name, not position
    b = t["region"].select(F.col("r_name").alias("name"), F.col("r_regionkey").alias("k"))
    return a.unionByName(b)


@register(
    "intersect_distinct",
    """
    SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O'
    """,
    "setop",
)
def intersect_distinct(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    a = o.where("o_orderstatus = 'F'").select(F.col("o_custkey").alias("ck"))
    b = o.where("o_orderstatus = 'O'").select(F.col("o_custkey").alias("ck"))
    return a.intersect(b)


@register(
    "intersect_all",
    """
    SELECT l_suppkey AS sk FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_suppkey AS sk FROM lineitem WHERE l_returnflag = 'R'
    """,
    "setop",
)
def intersect_all(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    a = li.where("l_returnflag = 'A'").select(F.col("l_suppkey").alias("sk"))
    b = li.where("l_returnflag = 'R'").select(F.col("l_suppkey").alias("sk"))
    return a.intersectAll(b)


# Right side restricted to high-value 'F' orders so the difference is a
# strict, SF-stable subset (r12 verdict: the unfiltered form was empty below
# sf0.1 — every customer has orders in this generator). Probed: 105/150,
# 1084/1500, 10832/15000.
@register(
    "except_distinct",
    """
    SELECT c_custkey AS ck FROM customer
    EXCEPT
    SELECT o_custkey AS ck FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 450000
    """,
    "setop",
)
def except_distinct(spark, sf_dir):
    t = load(spark, sf_dir, "customer", "orders")
    a = t["customer"].select(F.col("c_custkey").alias("ck"))
    b = (
        t["orders"]
        .where((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 450000))
        .select(F.col("o_custkey").alias("ck"))
    )
    return a.subtract(b)


@register(
    "except_all",
    """
    SELECT l_partkey AS pk FROM lineitem WHERE l_quantity > 40
    EXCEPT ALL
    SELECT l_partkey AS pk FROM lineitem WHERE l_discount > 0.08
    """,
    "setop",
)
def except_all(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    a = li.where("l_quantity > 40").select(F.col("l_partkey").alias("pk"))
    b = li.where("l_discount > 0.08").select(F.col("l_partkey").alias("pk"))
    return a.exceptAll(b)


@register(
    "distinct_dropdup",
    """
    SELECT DISTINCT l_returnflag, l_linestatus, l_suppkey FROM lineitem
    """,
    "setop",
)
def distinct_dropdup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.select("l_returnflag", "l_linestatus", "l_suppkey").dropDuplicates()


@register(
    "agg_exact_percentiles",
    """
    SELECT l_returnflag,
           MEDIAN(l_quantity) AS med_qty,
           quantile_cont(l_quantity, 0.25) AS p25_qty,
           quantile_cont(l_quantity, 0.75) AS p75_qty,
           MEDIAN(l_extendedprice) AS med_price
    FROM lineitem GROUP BY l_returnflag
    """,
    "aggregate",
)
def agg_exact_percentiles(spark, sf_dir):
    """EXACT median / percentile_cont — the precise counterpart of the
    approx_percentile sketch (operators/misc.py). Exact percentiles
    buffer each group's values (ObjectHashAggregate); at 100 TB that is
    the expensive-but-sometimes-required path (e.g. SLA reporting), and
    the sketch is the default. Interpolation is deterministic, so unlike
    the sketch this one IS value-oracle-checked."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.percentile("l_quantity", F.lit(0.25)).alias("p25_qty"),
        F.percentile("l_quantity", F.lit(0.75)).alias("p75_qty"),
        F.median("l_extendedprice").alias("med_price"),
    )


# ---------------------------------------------------------------------------
# Round 10 — classic warehouse analytics: association rules over order
# baskets and RFM customer segmentation. Both are exact-ratio arithmetic
# over integer counts (no libm), so the DuckDB oracle matches bit-for-bit.
# ---------------------------------------------------------------------------

_BASKET_MIN_PAIR = 5


@register(
    "market_basket_lift",
    f"""
    WITH bi AS (
        SELECT DISTINCT l_orderkey AS basket, p_brand AS item
        FROM lineitem JOIN part ON l_partkey = p_partkey),
    nb AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets FROM bi),
    ic AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS item_n FROM bi GROUP BY item),
    pairs AS (
        SELECT a.item AS item_a, b.item AS item_b,
               CAST(COUNT(*) AS BIGINT) AS pair_n
        FROM bi a JOIN bi b ON a.basket = b.basket AND a.item < b.item
        GROUP BY a.item, b.item)
    SELECT item_a, item_b, pair_n,
           CAST(pair_n AS DOUBLE) / n_baskets AS support,
           CAST(pair_n AS DOUBLE) / ia.item_n AS confidence_a_to_b,
           (CAST(pair_n AS DOUBLE) * n_baskets)
               / (CAST(ia.item_n AS DOUBLE) * ib.item_n) AS lift
    FROM pairs
    JOIN ic ia ON ia.item = item_a
    JOIN ic ib ON ib.item = item_b
    CROSS JOIN nb
    WHERE pair_n >= {_BASKET_MIN_PAIR}
    """,
    "relational",
    "analytics",
)
def market_basket_lift(spark, sf_dir):
    """Association-rule mining over order baskets (Agrawal & Srikant
    1994's support/confidence plus lift): brand pairs co-purchased in the
    same order, with exact-count support, confidence and lift. The
    classic cross-sell / co-occurrence analytic.

    Scale posture: baskets are first reduced to DISTINCT (basket, item) —
    the item domain is brand-sized (~25), so each basket contributes at
    most C(25,2) pairs and the self-join is an equi-join on the basket
    key, never a cross join; item totals and the basket count come back
    as broadcast frames. All three metrics are single IEEE divisions of
    exact BIGINT counts."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    pt = load(spark, sf_dir, "part")["part"]
    # bi feeds FIVE subtrees (basket count, item totals x2 via ia/ib,
    # both self-join sides) — unpersisted, each re-ran the join+distinct
    # (r16 multi-consumer audit). Eager count: lazy caches race under
    # AQE subtree futures.
    bi = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
        .distinct()
        .persist()
    )
    bi.count()
    nb = bi.agg(F.countDistinct("basket").cast("bigint").alias("n_baskets"))
    ic = bi.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("item_n"))
    a, b = bi.alias("a"), bi.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_n"))
        .where(F.col("pair_n") >= _BASKET_MIN_PAIR)
    )
    ia = ic.select(F.col("item").alias("item_a"), F.col("item_n").alias("a_n"))
    ib = ic.select(F.col("item").alias("item_b"), F.col("item_n").alias("b_n"))
    from ..caching import scope_caches

    return scope_caches(
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "pair_n",
            (F.col("pair_n").cast("double") / F.col("n_baskets")).alias("support"),
            (F.col("pair_n").cast("double") / F.col("a_n")).alias(
                "confidence_a_to_b"
            ),
            (
                (F.col("pair_n").cast("double") * F.col("n_baskets"))
                / (F.col("a_n").cast("double") * F.col("b_n"))
            ).alias("lift"),
        ),
        bi,
    )


@register(
    "rfm_segmentation",
    """
    WITH o AS (
        SELECT o_custkey,
               MAX(o_orderdate) AS last_order,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS monetary_cents
        FROM orders GROUP BY o_custkey),
    scored AS (
        SELECT o_custkey,
               CAST(NTILE(4) OVER (ORDER BY last_order DESC, o_custkey) AS INT) AS r,
               CAST(NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS INT) AS f,
               CAST(NTILE(4) OVER (ORDER BY monetary_cents DESC, o_custkey) AS INT) AS m,
               monetary_cents
        FROM o)
    SELECT r, f, m,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents
    FROM scored GROUP BY r, f, m
    """,
    "relational",
    "analytics",
)
def rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation (recency / frequency / monetary
    quartiles): per customer the days-since-last-order rank, order count
    and exact-cents lifetime spend, each quartiled with NTILE(4) over an
    explicit TOTAL order (metric + custkey tiebreak — NTILE over a
    non-total order is nondeterministic and would diverge between
    engines), then rolled up to the 4x4x4 segment matrix with customer
    counts and segment revenue. The r=f=m=1 cell is the classic
    "champions" segment.

    Scale posture: one groupBy over orders, then three global NTILE
    windows over the CUSTOMER-level frame (cardinality = customers, not
    orders — the global sort is over the already-reduced table; at larger
    scale the same quartiles come from approx_percentile boundaries
    without a global window, trading exactness), final rollup is 64
    groups."""
    o = load(spark, sf_dir, "orders")["orders"]
    cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("monetary_cents"),
    )
    wr = Window.orderBy(F.col("last_order").desc(), F.col("o_custkey"))
    wf = Window.orderBy(F.col("frequency").desc(), F.col("o_custkey"))
    wm = Window.orderBy(F.col("monetary_cents").desc(), F.col("o_custkey"))
    scored = cust.select(
        "o_custkey",
        F.ntile(4).over(wr).cast("int").alias("r"),
        F.ntile(4).over(wf).cast("int").alias("f"),
        F.ntile(4).over(wm).cast("int").alias("m"),
        "monetary_cents",
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("monetary_cents").cast("bigint").alias("segment_cents"),
    )
