"""Toggle canChangeCachedPlanOutputPartitioning per run on the r14 query
shapes (v1), interleaved in one session."""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONF = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"

def main():
    from spark_sql_flow_plugin_spark.session import get_session
    from ab_interleave2 import bm25_v, lm_v
    SF = "/root/testdata/sf0.1"
    spark = get_session("abc", cpus=32)
    for fn in (bm25_v, lm_v):
        fn(spark, SF, 1).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    res = {}
    anchors = []
    for r in range(3):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr("sum(crc32(md5(cast(id as string)))) s").collect()
        anchors.append(round(time.time() - t0, 3))
        for name, fn in (("bm25", bm25_v), ("lm", lm_v)):
            for conf in ("true", "false"):
                spark.conf.set(CONF, conf)
                spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, SF, 1).write.format("noop").mode("overwrite").save()
                res.setdefault(f"{name}.{conf}", []).append(round(time.time() - t0, 3))
    spark.conf.set(CONF, "true")
    print(json.dumps({"anchors": anchors, **{k: min(v) for k, v in res.items()}}))

if __name__ == "__main__":
    main()
