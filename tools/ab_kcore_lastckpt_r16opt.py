"""Interleaved A/B for the r16-opt "Not yet optimized" #5 (reduced
form): graph_kcore_peel localCheckpoints every round's induced edge
frame because it has TWO consumers (next round's degree + induction
join) and the truncation keeps the plan constant — but the LAST round's
edges feed exactly ONE consumer (the final degree aggregate), so its
localCheckpoint is a pure extra materialization job + memory write.
OLD = checkpoint all rounds (r16-close shape, inlined); NEW = current
registry builder (skip the final round's checkpoint; the single
remaining inline round keeps the plan bounded).
"""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
ROUNDS = 4


def old_kcore(spark, sf_dir):
    from spark_sql_flow_plugin_spark.caching import scope_caches
    from spark_sql_flow_plugin_spark.operators.graphs import (
        _KCORE_ROUNDS, _co_purchase_pairs)

    pairs = _co_purchase_pairs(spark, sf_dir).persist()

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
    for _ in range(_KCORE_ROUNDS):
        keep = degree(edges).where(F.col("d") >= k).select("node")
        edges = (
            edges.join(keep.withColumnRenamed("node", "i"), "i")
            .join(keep.withColumnRenamed("node", "j"), "j")
            .select("i", "j")
            .localCheckpoint()
        )
    out = degree(edges).select(
        F.col("node").cast("bigint").alias("node"),
        F.col("d").alias("core_deg"),
    )
    return scope_caches(out, pairs)


def main():
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.session import get_session

    spark = get_session("ab-kcore-lastckpt", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    anchor = 1e9
    for i in range(3):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(crc32(md5(cast(id as string)))) s"
        ).collect()
        if i:
            anchor = min(anchor, time.time() - t0)
    new_fn = _reg.queries()["graph_kcore_peel"]
    rounds = []
    for r in range(ROUNDS):
        pair = {}
        for tag, fn in (("old", old_kcore), ("new", new_fn)):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, SF).count()
            pair[tag] = round(time.time() - t0, 3)
        rounds.append(pair)
    print(json.dumps({
        "anchor_md5_20m": round(anchor, 3),
        "rounds": rounds,
        "min_old": min(p["old"] for p in rounds),
        "min_new": min(p["new"] for p in rounds),
    }))


if __name__ == "__main__":
    main()
