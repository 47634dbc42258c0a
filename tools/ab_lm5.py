"""lm_bigram_score variants under conf=true:
  v1 = r14 shape; v5 = v1 + reused doc-grain repartition between cache and
  all three consumers; v6 = repartition inside cache, no materialize."""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"

def _pairs(spark, sf_dir):
    from spark_sql_flow_plugin_spark.operators.text import _SPARK_WTOKS, _SPARK_BIGRAMS
    from spark_sql_flow_plugin_spark.sources.tables import load
    d = load(spark, sf_dir, "documents")["documents"]
    return (d.select("doc_id", F.expr(_SPARK_WTOKS).alias("toks"))
            .where(F.expr("size(toks)") >= 2)
            .select("doc_id", F.explode(F.expr(_SPARK_BIGRAMS)).alias("p"))
            .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg")))

def _score(spark, big):
    from spark_sql_flow_plugin_spark.caching import scope_caches
    c12 = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (big.join(c12, "bg").join(c1, "w1").groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_bigrams"),
                   F.sum(F.expr("CAST(FLOOR(1e9 * (CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))) AS BIGINT)"))
                   .cast("bigint").alias("lm_score_q9")))
    return scored

def lm_v(spark, sf_dir, v):
    from spark_sql_flow_plugin_spark.caching import scope_caches
    P = spark.sparkContext.defaultParallelism
    pairs = _pairs(spark, sf_dir)
    if v == 1:
        big = pairs.persist()
        return scope_caches(_score(spark, big), big)
    if v == 5:
        big = pairs.persist()
        return scope_caches(_score(spark, big.repartition(P, "doc_id")), big)
    big = pairs.repartition(P, "doc_id").persist()
    return scope_caches(_score(spark, big), big)

def main():
    from spark_sql_flow_plugin_spark.session import get_session
    spark = get_session("ab5", cpus=32)
    for v in (1, 5, 6):
        lm_v(spark, SF, v).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    res = {}
    anchors = []
    for r in range(4):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr("sum(crc32(md5(cast(id as string)))) s").collect()
        anchors.append(round(time.time() - t0, 3))
        for v in (1, 5, 6):
            spark.catalog.clearCache()
            t0 = time.time()
            lm_v(spark, SF, v).write.format("noop").mode("overwrite").save()
            res.setdefault(f"lm.v{v}", []).append(round(time.time() - t0, 3))
    print(json.dumps({"anchors": anchors, **{k: min(x) for k, x in res.items()}}))

if __name__ == "__main__":
    main()
