"""Interleaved A/B for dsir_importance_weights' persist grain (r16-opt
continuation): OLD = token-grain occb persist (the r16-close shape,
inlined below), NEW = current registry (per-(doc,bucket) count persist,
partition-local pre-agg). Alternates inside one JVM, cache cleared per
run, min + per-round pairs reported. Run at sf0.1 and sf1."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf1"
ROUNDS = 3


def old_dsir(spark, sf_dir):
    from pyspark.sql import functions as F

    from spark_sql_flow_plugin_spark.caching import scope_caches
    from spark_sql_flow_plugin_spark.operators.curation import (
        _DSIR_Q,
        _DSIR_TARGET,
        _SPARK_DSIR_BUCKET,
        _SPARK_WTOKS,
    )
    from spark_sql_flow_plugin_spark.partitioning import spread
    from spark_sql_flow_plugin_spark.sources import load

    d = load(spark, sf_dir, "documents")["documents"]
    occb = (
        spread(spark, d, sf_dir, "documents", "doc_id")
        .select(
            "doc_id",
            (F.col("source") == _DSIR_TARGET).alias("is_t"),
            F.explode(F.expr(_SPARK_WTOKS)).alias("tok"),
        )
        .select("doc_id", "is_t", F.expr(_SPARK_DSIR_BUCKET).alias("b"))
        .persist()
    )
    tot = occb.agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).cast("bigint").alias("n_t"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).cast("bigint").alias("n_r"),
    )
    model = occb.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).cast("bigint").alias("c_t"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).cast("bigint").alias("c_r"),
    )
    q = model.crossJoin(F.broadcast(tot)).select("b", F.expr(_DSIR_Q).alias("qv"))
    return scope_caches(
        occb.where(~F.col("is_t"))
        .join(F.broadcast(q), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_toks"),
            F.sum("qv").cast("bigint").alias("dsir_q6"),
            F.expr("CAST(SUM(qv) AS BIGINT) DIV COUNT(*)").alias("avg_q6"),
        ),
        occb,
    )


def main():
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.session import get_session

    spark = get_session("ab-dsir", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    anchor = 1e9
    for i in range(3):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(crc32(md5(cast(id as string)))) s"
        ).collect()
        if i:
            anchor = min(anchor, time.time() - t0)
    new_fn = _reg.queries()["dsir_importance_weights"]
    res = {}
    for r in range(ROUNDS):
        for tag, fn in (("old", old_dsir), ("new", new_fn)):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, SF).count()
            res.setdefault(tag, []).append(round(time.time() - t0, 3))
    print(json.dumps({
        "sf_dir": SF,
        "anchor_md5_20m": round(anchor, 3),
        "rounds": res,
        "mins": {k: min(v) for k, v in res.items()},
    }))


if __name__ == "__main__":
    main()
