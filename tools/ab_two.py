"""Standalone A/B timer for a subset of registry queries (r15 item #1)."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    names = sys.argv[1:] or ["bm25_topk", "lm_bigram_score"]
    sf_dir = "/root/testdata/sf0.1"
    from spark_sql_flow_plugin_spark.session import get_session
    from spark_sql_flow_plugin_spark import registry as _reg
    spark = get_session("ab", cpus=32)
    # md5 CPU anchor (min of 3, first run is JVM warmup and discarded)
    anchor = 1e9
    for i in range(3):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr("sum(crc32(md5(cast(id as string)))) s").collect()
        if i:
            anchor = min(anchor, time.time() - t0)
    out = {"anchor_md5_20m": round(anchor, 3)}
    for n in names:
        fn = _reg.queries()[n]
        best = 1e9
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[n] = round(best, 3)
    print(json.dumps(out))

if __name__ == "__main__":
    main()
