"""Interleaved A/B for freq_heavy_hitters' size-bounded spread gate
(r16-opt continuation 3): OLD = ungated spread (the b64a761 shape —
always repartition the split-starved scan), NEW = current registry
(min_bytes=_SPREAD_MIN_BYTES, identity below 2 MiB). Same protocol as
ab_curate_sf1_r16opt.py."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf0.1"
ROUNDS = 3


def main():
    from spark_sql_flow_plugin_spark.operators import frequency as _freq
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.session import get_session

    real_spread = _freq.spread

    def ungated_spread(spark, df, sf_dir, table, *keys, **kw):
        kw.pop("min_bytes", None)
        return real_spread(spark, df, sf_dir, table, *keys)

    spark = get_session("ab-freq-gate", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    anchor = 1e9
    for i in range(3):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(crc32(md5(cast(id as string)))) s"
        ).collect()
        if i:
            anchor = min(anchor, time.time() - t0)
    fn = _reg.queries()["freq_heavy_hitters"]
    res = {}
    for r in range(ROUNDS):
        for tag, sp in (("old", ungated_spread), ("new", real_spread)):
            _freq.spread = sp
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, SF).count()
            res.setdefault(tag, []).append(round(time.time() - t0, 3))
    _freq.spread = real_spread
    print(json.dumps({
        "sf_dir": SF,
        "anchor_md5_20m": round(anchor, 3),
        "rounds": res,
        "mins": {k: min(v) for k, v in res.items()},
    }))


if __name__ == "__main__":
    main()
