"""Interleaved A/B for the r16-opt triangle/linkpred rework: OLD =
r16-close shapes (union-based degree/adjacency expansion + the 4-barrier
triangle chain), NEW = current registry builders (single-pass explode
expansion, 2 barriers). Alternates within one session."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window

SF = "/root/testdata/sf0.1"
ROUNDS = 4
_TRI_ORD_BASE = None  # filled in main from the module


def old_orient(pairs, caches):
    from spark_sql_flow_plugin_spark.operators.graphs import _TRI_ORD_BASE

    deg = (
        pairs.select(F.col("i").alias("node"))
        .unionAll(pairs.select(F.col("j").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    nord = deg.select(
        "node",
        (F.col("d") * F.lit(_TRI_ORD_BASE).cast("bigint")
         + F.col("node").cast("bigint")).alias("nord"),
    )
    nord = nord.persist()
    nord.count()
    caches.append(nord)
    oi = nord.select(F.col("node").alias("i"), F.col("nord").alias("oi"))
    oj = nord.select(F.col("node").alias("j"), F.col("nord").alias("oj"))
    lower_first = F.col("oi") < F.col("oj")
    return (
        pairs.join(oi, "i")
        .join(oj, "j")
        .select(
            F.when(lower_first, F.col("i")).otherwise(F.col("j")).alias("src"),
            F.when(lower_first, F.col("j")).otherwise(F.col("i")).alias("dst"),
            F.greatest(F.col("oi"), F.col("oj")).alias("dord"),
        )
    )


def old_triangle(spark, sf_dir):
    from spark_sql_flow_plugin_spark.caching import scope_caches
    from spark_sql_flow_plugin_spark.operators.graphs import (
        _co_purchase_pairs, triangle_corners)

    caches = []
    pairs = _co_purchase_pairs(spark, sf_dir).persist()
    pairs.count()
    caches.append(pairs)
    edges = old_orient(pairs, caches).persist()
    edges.count()
    caches.append(edges)
    tri = triangle_corners(edges, caches=caches)
    verts = tri.select(
        F.explode(F.array(F.col("u"), F.col("v"), F.col("w"))).alias("node")
    )
    out = verts.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tri")
    ).select(F.col("node").cast("bigint").alias("node"), "n_tri")
    return scope_caches(out, *caches)


def old_linkpred(spark, sf_dir):
    from spark_sql_flow_plugin_spark.caching import scope_caches
    from spark_sql_flow_plugin_spark.operators.graphs import (
        _LINKPRED_CAP, _LINKPRED_TOPK, _co_purchase_pairs)

    pairs = _co_purchase_pairs(spark, sf_dir).persist()
    adjn = pairs.select(F.col("i").alias("node"), F.col("j").alias("nbr")).unionAll(
        pairs.select(F.col("j").alias("node"), F.col("i").alias("nbr"))
    )
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

    spark = get_session("ab-trilp", cpus=32)
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
        ("lp_old", old_linkpred),
        ("lp_new", qs["graph_common_neighbors_linkpred"]),
    ]
    res = {name: [] for name, _ in variants}
    for r in range(ROUNDS):
        for name, fn in variants:
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, SF).count()
            res[name].append(round(time.time() - t0, 3))
    print(json.dumps({
        "anchor_md5_20m": round(anchor, 3),
        "rounds": res,
        "mins": {k: min(v) for k, v in res.items()},
    }))


if __name__ == "__main__":
    main()
