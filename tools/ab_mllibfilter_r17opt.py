"""Interleaved A/B for the r17-opt minhash_mllib bucket-sharing
pre-filter: OLD = r16-close shape (approxSimilarityJoin(feats, feats)
directly), NEW = current registry builder (both sides semi-joined to
docs sharing >= 1 LSH bucket, model.transform output passed through).
Output-invariant for seed=42 — every emitted pair shares a bucket, so
both members survive the filter. Alternates within one JVM.

Usage: python tools/ab_mllibfilter_r17opt.py [sf_dir] [rounds]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def old_mllib(spark, sf_dir):
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from spark_sql_flow_plugin_spark.caching import scope_caches
    from spark_sql_flow_plugin_spark.operators.dedup import (
        _SPARK_SHINGLES, _SPARK_TOKS, augmented_documents)
    from spark_sql_flow_plugin_spark.sources import load

    _NGRAM3_EXPR = (
        "zip_with("
        "  slice(toks, 1, size(toks) - 2),"
        "  zip_with(slice(toks, 2, size(toks) - 2), slice(toks, 3, size(toks) - 2),"
        "           (y, z) -> concat(y, ' ', z)),"
        "  (x, yz) -> concat(x, ' ', yz)"
        ")"
    )

    aug = augmented_documents(spark, sf_dir)
    shingled = (
        aug.select("doc_id", F.expr(_SPARK_TOKS).alias("toks"))
        .where(F.size("toks") >= 3)
        .select("doc_id", F.expr(_NGRAM3_EXPR).alias("shingles"))
    )
    cv = CountVectorizer(
        inputCol="shingles", outputCol="features", binary=True, minDF=1.0,
        vocabSize=1 << 22,
    ).fit(shingled)
    feats = cv.transform(shingled).select("doc_id", "features").persist()
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=4, seed=42
    ).fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.4, distCol="jaccard_dist")
    found = (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
        )
        .distinct()
        .persist()
    )
    found.count()
    sh = (
        aug.select("doc_id", F.expr(_SPARK_TOKS).alias("toks"))
        .where(F.size("toks") >= 3)
        .select("doc_id", F.expr(_SPARK_SHINGLES).alias("sh"))
        .persist()
    )

    def exact_jacc(a, b):
        inter = F.size(F.array_intersect(a, b))
        return inter.cast("double") / (F.size(a) + F.size(b) - inter)

    fj = (
        found.join(sh.alias("pa"), found["doc_a"] == F.col("pa.doc_id"))
        .join(sh.alias("pb"), found["doc_b"] == F.col("pb.doc_id"))
        .select(
            "doc_a", "doc_b",
            exact_jacc(F.col("pa.sh"), F.col("pb.sh")).alias("jacc"),
        )
    )
    prec = fj.agg(
        F.coalesce(F.bool_and(F.col("jacc") >= 0.6 - 1e-9), F.lit(True)).alias(
            "precision_ok"
        ),
        F.sum(
            (
                (F.col("doc_b") == F.col("doc_a") + 2000000)
                & (F.col("doc_a") < 1000000)
            ).cast("long")
        ).alias("exact_recovered"),
    )
    near_true = (
        sh.alias("x")
        .join(sh.alias("y"), F.col("y.doc_id") == F.col("x.doc_id") + 1000000)
        .where(F.col("x.doc_id") < 1000000)
        .where(exact_jacc(F.col("x.sh"), F.col("y.sh")) >= 0.6)
        .select(F.col("x.doc_id").alias("doc_a"))
    )
    n_near = near_true.agg(F.count(F.lit(1)).alias("n_near_true"))
    recovered = (
        near_true.join(
            found.where(
                (F.col("doc_b") == F.col("doc_a") + 1000000)
                & (F.col("doc_a") < 1000000)
            ),
            "doc_a",
        )
        .agg(F.count(F.lit(1)).alias("near_recovered"))
    )
    n_planted = (
        load(spark, sf_dir, "documents")["documents"]
        .where(F.col("doc_id") % 5 == 0)
        .select(F.expr(_SPARK_TOKS).alias("toks"))
        .where(F.size("toks") >= 3)
        .agg(F.count(F.lit(1)).alias("n_exact_planted"))
    )
    return scope_caches(
        n_planted.crossJoin(prec)
        .crossJoin(n_near)
        .crossJoin(recovered)
        .select(
            "n_exact_planted",
            "exact_recovered",
            "n_near_true",
            (F.col("near_recovered") * 10 >= F.col("n_near_true") * 7).alias(
                "near_recall_ok"
            ),
            "precision_ok",
        ),
        feats,
        found,
        sh,
    )


def main():
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.session import get_session

    spark = get_session("ab-mllibfilter", cpus=32)
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
    variants = [
        ("mllib_old", old_mllib),
        ("mllib_new", qs["dedup_minhash_mllib"]),
    ]
    res = {name: [] for name, _ in variants}
    rows = {}
    for _ in range(ROUNDS):
        for name, fn in variants:
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, SF)
            got = sorted(map(str, df.collect()))
            res[name].append(round(time.time() - t0, 3))
            prev = rows.setdefault(name, got)
            assert got == prev, f"{name} nondeterministic"
    assert rows["mllib_old"] == rows["mllib_new"], (
        "OUTPUT MISMATCH", rows["mllib_old"], rows["mllib_new"])
    print(json.dumps({
        "sf_dir": SF,
        "anchor_md5_20m": round(anchor, 3),
        "rows_equal": True,
        "rows": rows["mllib_new"],
        "rounds": res,
        "mins": {k: min(v) for k, v in res.items()},
    }))


if __name__ == "__main__":
    main()
