"""Interleaved A/B for the r16-opt spread() gates: OLD = un-spread
co-purchase pairs / substring grams (r16-close shapes via monkeypatch),
NEW = current registry. Alternates in one session."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
ROUNDS = 3
QUERIES = ["graph_triangle_count", "graph_kcore_peel",
           "graph_common_neighbors_linkpred", "dedup_exact_substring_spans"]


def main():
    from spark_sql_flow_plugin_spark import partitioning as _part
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.session import get_session

    real_spread = _part.spread
    ident_spread = lambda spark, df, sf_dir, table, *keys: df

    spark = get_session("ab-spread", cpus=32)
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
    res = {}
    for r in range(ROUNDS):
        for tag, fn in (("old", ident_spread), ("new", real_spread)):
            _part.spread = fn
            # operators import `spread` via `from ..partitioning import
            # spread` INSIDE the builder body, so patching the module
            # attribute takes effect per call
            for q in QUERIES:
                spark.catalog.clearCache()
                t0 = time.time()
                qs[q](spark, SF).count()
                res.setdefault(f"{q}:{tag}", []).append(
                    round(time.time() - t0, 3))
    _part.spread = real_spread
    print(json.dumps({
        "anchor_md5_20m": round(anchor, 3),
        "rounds": res,
        "mins": {k: min(v) for k, v in res.items()},
    }))


if __name__ == "__main__":
    main()
