"""Interleaved A/B for the r16-opt augmented_documents coalesce: OLD =
3 x n_parts partition union (r16-close shape, monkeypatched below), NEW =
current gated coalesce(n_parts). Same session, alternating rounds."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
ROUNDS = 3
QUERIES = ["dedup_minhash_lsh", "dedup_exact", "dedup_components",
           "dedup_ngram_jaccard"]


def old_aug(spark, sf_dir):
    from spark_sql_flow_plugin_spark.operators.dedup import (
        _SPARK_TOKS, _estimated_splits)
    from spark_sql_flow_plugin_spark.sources import load

    d = load(spark, sf_dir, "documents")["documents"].select("doc_id", "text")
    n_parts = spark.sparkContext.defaultParallelism
    if _estimated_splits(spark, f"{sf_dir}/documents.parquet") < n_parts:
        d = d.repartition(n_parts, "doc_id")
    toks = d.select("doc_id", F.expr(_SPARK_TOKS).alias("toks"))
    near = (
        toks.where(F.size("toks") > 4)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.array_join(F.expr("slice(toks, 3, size(toks) - 2)"), " ").alias("text"),
        )
    )
    exact = d.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    return d.union(near).union(exact)


def main():
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.operators import dedup as _dedup
    from spark_sql_flow_plugin_spark.session import get_session

    new_aug = _dedup.augmented_documents
    spark = get_session("ab-aug", cpus=32)
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
        for tag, aug in (("old", old_aug), ("new", new_aug)):
            _dedup.augmented_documents = aug
            for q in QUERIES:
                spark.catalog.clearCache()
                t0 = time.time()
                qs[q](spark, SF).count()
                res.setdefault(f"{q}:{tag}", []).append(
                    round(time.time() - t0, 3))
    _dedup.augmented_documents = new_aug
    print(json.dumps({
        "anchor_md5_20m": round(anchor, 3),
        "rounds": res,
        "mins": {k: min(v) for k, v in res.items()},
    }))


if __name__ == "__main__":
    main()
