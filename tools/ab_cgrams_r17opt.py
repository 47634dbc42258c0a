"""Interleaved A/B for the r17 dedup_ngram_jaccard trigram expression:
OLD = transform(sequence(...)) HOF (interpreted fallback), NEW =
zero-width-lookahead regexp_extract_all (codegen). Same builder, the
module constant is patched per arm; collected outputs asserted equal.

Usage: python tools/ab_cgrams_r17opt.py [sf_dir] [rounds]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

OLD = (
    "array_distinct(transform(sequence(1, length(text) - 2), "
    "i -> substr(text, i, 3)))"
)


def main():
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.operators import dedup as _dd
    from spark_sql_flow_plugin_spark.session import get_session

    spark = get_session("ab-cgrams", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    anchor = 1e9
    for i in range(3):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(crc32(md5(cast(id as string)))) s"
        ).collect()
        if i:
            anchor = min(anchor, time.time() - t0)
    NEW = _dd._SPARK_CGRAMS
    fn = _reg.queries()["dedup_ngram_jaccard"]
    res = {"cgrams_old": [], "cgrams_new": []}
    digests = {}
    for _ in range(ROUNDS):
        for name, expr in (("cgrams_old", OLD), ("cgrams_new", NEW)):
            _dd._SPARK_CGRAMS = expr
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, SF)
            got = sorted(map(str, df.collect()))
            res[name].append(round(time.time() - t0, 3))
            prev = digests.setdefault(name, got)
            assert got == prev, f"{name} nondeterministic"
    _dd._SPARK_CGRAMS = NEW
    assert digests["cgrams_old"] == digests["cgrams_new"], "OUTPUT MISMATCH"
    print(json.dumps({
        "sf_dir": SF,
        "anchor_md5_20m": round(anchor, 3),
        "rows_equal": True,
        "n_rows": len(digests["cgrams_new"]),
        "rounds": res,
        "mins": {k: min(v) for k, v in res.items()},
    }))


if __name__ == "__main__":
    main()
