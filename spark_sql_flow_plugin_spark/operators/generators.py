"""Generator / array surface: explode, posexplode, stack, inline, split.

Reference corpus: collect_set→explode chain (README.md:98-115,
SQLFlowSuite.scala:812-818), stack (scalar-subquery-predicate.sql),
array(...) (scalar-subquery.sql); Catalyst operator: Generate
(SQLFlow.scala:386-399).

Determinism: arrays that feed position-sensitive generators are sorted
first (collect_list/collect_set ordering is partition-dependent otherwise).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..sources import load


@register(
    "explode_collect_set",
    """
    SELECT c_nationkey, unnest(list(DISTINCT c_mktsegment)) AS seg
    FROM customer GROUP BY c_nationkey
    """,
    "generator",
)
def explode_collect_set(spark, sf_dir):
    c = load(spark, sf_dir, "customer")["customer"]
    return (
        c.groupBy("c_nationkey")
        .agg(F.collect_set("c_mktsegment").alias("segs"))
        .select("c_nationkey", F.explode("segs").alias("seg"))
    )


@register(
    "posexplode_sorted",
    """
    WITH t AS (SELECT l_orderkey, list_sort(list(l_linenumber)) AS l
               FROM lineitem GROUP BY l_orderkey),
         u AS (SELECT l_orderkey, l, unnest(generate_series(1, len(l))) AS p FROM t)
    SELECT l_orderkey, CAST(p - 1 AS INT) AS pos, l[p] AS ln FROM u
    """,
    "generator",
)
def posexplode_sorted(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_linenumber")).alias("l"))
        .select("l_orderkey", F.posexplode("l").alias("pos", "ln"))
    )


@register(
    "stack_unpivot",
    """
    SELECT l_orderkey, l_linenumber, 'qty' AS metric, l_quantity AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price' AS metric, l_extendedprice AS val FROM lineitem
    """,
    "generator",
)
def stack_unpivot(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("stack(2, 'qty', l_quantity, 'price', l_extendedprice)").alias(
            "metric", "val"
        ),
    )


@register(
    "inline_structs",
    """
    SELECT o_orderkey, 'total' AS k, o_totalprice AS v FROM orders WHERE o_totalprice > 9000
    UNION ALL
    SELECT o_orderkey, 'half' AS k, o_totalprice / 2 AS v FROM orders WHERE o_totalprice > 9000
    """,
    "generator",
)
def inline_structs(spark, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    return o.where(F.col("o_totalprice") > 9000).select(
        "o_orderkey",
        F.inline(
            F.array(
                F.struct(F.lit("total").alias("k"), F.col("o_totalprice").alias("v")),
                F.struct(
                    F.lit("half").alias("k"), (F.col("o_totalprice") / 2).alias("v")
                ),
            )
        ),
    )


@register(
    "explode_split_tokens",
    r"""
    SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
    FROM documents WHERE doc_id % 10 = 0
    """,
    "generator",
    "text",
)
def explode_split_tokens(spark, sf_dir):
    d = load(spark, sf_dir, "documents")["documents"]
    return d.where(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("token")
    )
