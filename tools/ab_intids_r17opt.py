"""Interleaved A/B for the r17-opt INT-id narrowing of the co-purchase
graph family: OLD = r16-close shapes (BIGINT l_partkey ids end to end;
triangle persists dord), NEW = current registry builders (footer-stats
gated INT ids, triangle drops dord before the persist). Alternates
within one JVM so host drift cancels.

Usage: python tools/ab_intids_r17opt.py [sf_dir] [rounds]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def old_pairs(spark, sf_dir):
    from spark_sql_flow_plugin_spark.partitioning import spread
    from spark_sql_flow_plugin_spark.sources import load

    li = load(spark, sf_dir, "lineitem")["lineitem"].select(
        "l_orderkey", "l_partkey"
    )
    li = spread(spark, li, sf_dir, "lineitem", "l_orderkey")
    return (
        li.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        .select(F.explode("ps").alias("i"), "ps")
        .select("i", F.explode(F.expr("filter(ps, x -> x > i)")).alias("j"))
        .distinct()
    )


def old_triangle(spark, sf_dir):
    from spark_sql_flow_plugin_spark.caching import scope_caches
    from spark_sql_flow_plugin_spark.operators.graphs import (
        orient_edges_by_degree, triangle_corners)

    caches = []
    pairs = old_pairs(spark, sf_dir).persist()
    caches.append(pairs)
    edges = orient_edges_by_degree(pairs, caches=caches).persist()  # keeps dord
    caches.append(edges)
    tri = triangle_corners(edges, caches=caches)
    verts = tri.select(
        F.explode(F.array(F.col("u"), F.col("v"), F.col("w"))).alias("node")
    )
    out = verts.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tri")
    ).select(F.col("node").cast("bigint").alias("node"), "n_tri")
    return scope_caches(out, *caches)


def old_kcore(spark, sf_dir):
    from spark_sql_flow_plugin_spark.caching import scope_caches
    from spark_sql_flow_plugin_spark.operators.graphs import _KCORE_ROUNDS

    pairs = old_pairs(spark, sf_dir).persist()

    def degree(edges):
        return (
            edges.select(
                F.explode(F.array(F.col("i"), F.col("j"))).alias("node")
            )
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        )

    deg0 = degree(pairs)
    k = deg0.agg(
        F.expr("CAST((SUM(d) * 3) DIV (COUNT(*) * 4) AS BIGINT)").alias("k")
    ).collect()[0].k
    edges = pairs
    for r in range(_KCORE_ROUNDS):
        keep = degree(edges).where(F.col("d") >= k).select("node")
        edges = (
            edges.join(keep.withColumnRenamed("node", "i"), "i")
            .join(keep.withColumnRenamed("node", "j"), "j")
            .select("i", "j")
        )
        if r != _KCORE_ROUNDS - 1:
            edges = edges.localCheckpoint()
    out = degree(edges).select(
        F.col("node").cast("bigint").alias("node"),
        F.col("d").alias("core_deg"),
    )
    return scope_caches(out, pairs)


def old_linkpred(spark, sf_dir):
    from spark_sql_flow_plugin_spark.caching import scope_caches
    from spark_sql_flow_plugin_spark.operators.graphs import (
        _LINKPRED_CAP, _LINKPRED_TOPK)

    pairs = old_pairs(spark, sf_dir).persist()
    adjn = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("i").alias("node"), F.col("j").alias("nbr")),
                F.struct(F.col("j").alias("node"), F.col("i").alias("nbr")),
            )
        ).alias("e")
    ).select("e.node", "e.nbr")
    capped = adjn.groupBy("node").agg(
        F.slice(F.sort_array(F.collect_list("nbr")), 1, _LINKPRED_CAP).alias("nbrs")
    ).persist()
    capped.count()
    rdeg = (
        capped.select(F.explode("nbrs").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    cn = (
        capped.select(F.explode("nbrs").alias("a"), "nbrs")
        .select("a", F.explode(F.expr("filter(nbrs, x -> x > a)")).alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common_nbrs"))
        .where(F.col("common_nbrs") >= 2)
    )
    nonadj = cn.join(pairs, (cn.a == pairs.i) & (cn.b == pairs.j), "left_anti")
    da = rdeg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = rdeg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    scored = (
        nonadj.join(da, "a").join(db, "b")
        .select(
            "a", "b", "common_nbrs",
            (F.col("da") + F.col("db") - F.col("common_nbrs")).alias("union_deg"),
            (F.col("common_nbrs").cast("double")
             / (F.col("da") + F.col("db") - F.col("common_nbrs")).cast("double")
             ).alias("jaccard"),
        )
    )
    w = Window.orderBy(
        F.col("common_nbrs").desc(), F.col("union_deg").asc(),
        F.col("a").asc(), F.col("b").asc(),
    )
    out = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _LINKPRED_TOPK)
        .drop("rn")
    )
    return scope_caches(out, pairs, capped)


def main():
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.session import get_session

    spark = get_session("ab-intids", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    anchor = 1e9
    for i in range(3):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(crc32(md5(cast(id as string)))) s"
        ).collect()
        if i:
            anchor = min(anchor, time.time() - t0)
    qs = _reg.queries()
    variants = [
        ("tri_old", old_triangle),
        ("tri_new", qs["graph_triangle_count"]),
        ("kcore_old", old_kcore),
        ("kcore_new", qs["graph_kcore_peel"]),
        ("lp_old", old_linkpred),
        ("lp_new", qs["graph_common_neighbors_linkpred"]),
    ]
    res = {name: [] for name, _ in variants}
    for _ in range(ROUNDS):
        for name, fn in variants:
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, SF).count()
            res[name].append(round(time.time() - t0, 3))
    print(json.dumps({
        "sf_dir": SF,
        "anchor_md5_20m": round(anchor, 3),
        "rounds": res,
        "mins": {k: min(v) for k, v in res.items()},
    }))


if __name__ == "__main__":
    main()
