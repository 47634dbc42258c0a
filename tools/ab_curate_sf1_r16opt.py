"""Interleaved A/B for curate_corpus' size-bounded spread gate (r16-opt
continuation): OLD = identity spread (the r16-close shape), NEW =
current registry. Same protocol as ab_textspread_sf1_r16opt.py."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf1"
ROUNDS = 3


def main():
    from spark_sql_flow_plugin_spark.operators import pipeline as _pipe
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.session import get_session

    real_spread = _pipe.spread
    ident_spread = lambda spark, df, sf_dir, table, *keys, **kw: df

    spark = get_session("ab-curate", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    anchor = 1e9
    for i in range(3):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(crc32(md5(cast(id as string)))) s"
        ).collect()
        if i:
            anchor = min(anchor, time.time() - t0)
    fn = _reg.queries()["curate_corpus"]
    res = {}
    for r in range(ROUNDS):
        for tag, sp in (("old", ident_spread), ("new", real_spread)):
            _pipe.spread = sp
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, SF).count()
            res.setdefault(tag, []).append(round(time.time() - t0, 3))
    _pipe.spread = real_spread
    print(json.dumps({
        "sf_dir": SF,
        "anchor_md5_20m": round(anchor, 3),
        "rounds": res,
        "mins": {k: min(v) for k, v in res.items()},
    }))


if __name__ == "__main__":
    main()
