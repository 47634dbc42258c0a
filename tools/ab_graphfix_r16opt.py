"""Interleaved A/B for the r16-opt single-pass symmetric-expansion fixes:
OLD = r16-close shapes (union-based und over the un-checkpointed lsh
result; union-based degree() in kcore), NEW = current registry builders.
Alternates within one session; reports per-round pairs + mins + anchor."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
ROUNDS = 4


def old_components(spark, sf_dir):
    from spark_sql_flow_plugin_spark.operators.dedup import (
        _propagate_min_labels, dedup_minhash_lsh)

    lsh = dedup_minhash_lsh(spark, sf_dir)
    pairs = lsh.select("doc_a", "doc_b")
    und = (
        pairs.union(pairs.select("doc_b", "doc_a"))
        .toDF("src", "dst")
        .localCheckpoint()
    )
    del lsh, pairs
    n_edges = und.count()
    npart = max(1, -(-n_edges // 2_000_000))
    und = und.repartition(npart, "dst").localCheckpoint()
    labels, _ = _propagate_min_labels(spark, und, npart)
    return (
        labels.groupBy("comp")
        .agg(F.count("*").alias("n_docs"))
        .select(F.col("comp").alias("component"), "n_docs")
    )


def old_kcore(spark, sf_dir):
    from spark_sql_flow_plugin_spark.caching import scope_caches
    from spark_sql_flow_plugin_spark.operators.graphs import (
        _KCORE_ROUNDS, _co_purchase_pairs)

    pairs = _co_purchase_pairs(spark, sf_dir).persist()

    def degree(edges):
        return (
            edges.select(F.col("i").alias("node"))
            .unionAll(edges.select(F.col("j").alias("node")))
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

    spark = get_session("ab-graphfix", cpus=32)
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
        ("components_old", old_components),
        ("components_new", qs["dedup_components"]),
        ("kcore_old", old_kcore),
        ("kcore_new", qs["graph_kcore_peel"]),
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
