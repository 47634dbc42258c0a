"""Interleaved A/B for the r17 VALUES-LocalRelation literal frames:
OLD = spark.createDataFrame (RDD-parallelized into 32 slices; every
consuming job runs a 32-task ghost scan), NEW = functions.exprs.
local_values (zero-task VALUES plan). Same builders; the helper is
patched per arm. Collected rows asserted equal.

Usage: python tools/ab_localvalues_r17opt.py [sf_dir] [rounds]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
QUERIES = ["bm25_topk", "text_normalize_nfc", "bpe_train_merges"]


def main():
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.functions.exprs import local_values
    from spark_sql_flow_plugin_spark.operators import text as _tx
    from spark_sql_flow_plugin_spark.session import get_session

    spark = get_session("ab-localvalues", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    anchor = 1e9
    for i in range(3):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(crc32(md5(cast(id as string)))) s"
        ).collect()
        if i:
            anchor = min(anchor, time.time() - t0)

    def old_helper(spark, rows, schema):
        return spark.createDataFrame(rows, schema)

    qs = _reg.queries()
    res = {}
    digests = {}
    for r in range(ROUNDS):
        for arm, helper in (("old", old_helper), ("new", local_values)):
            _tx.local_values = helper
            for name in QUERIES:
                spark.catalog.clearCache()
                t0 = time.time()
                df = qs[name](spark, SF)
                got = sorted(map(str, df.collect()))
                res.setdefault(name, {}).setdefault(arm, []).append(
                    round(time.time() - t0, 3)
                )
                key = (name, arm)
                digests.setdefault(key, got)
                assert digests[key] == got, f"{key} nondeterministic"
    _tx.local_values = local_values
    for name in QUERIES:
        assert digests[(name, "old")] == digests[(name, "new")], name
    print(json.dumps({
        "sf_dir": SF,
        "anchor_md5_20m": round(anchor, 3),
        "rows_equal": True,
        "per_query": res,
        "mins": {
            n: {a: min(v) for a, v in arms.items()}
            for n, arms in res.items()
        },
    }))


if __name__ == "__main__":
    main()
