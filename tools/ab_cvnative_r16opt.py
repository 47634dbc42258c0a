"""Interleaved A/B for the r16-opt candidate #1 ("Not yet optimized"):
replace dedup_minhash_mllib's CountVectorizer.fit (a full MLlib RDD
wordCount pass: flatMap OpenHashMap -> reduceByKey -> top(vocabSize))
with a native explode/groupBy vocabulary aggregate collected to the
driver and CountVectorizerModel.from_vocabulary.

RESULT: NOT ADOPTED — the native variant measured WORSE (min 8.04 s vs
3.14 s over 4 interleaved rounds at anchor 0.506; phase probe: warm fit
0.9 s vs native aggregate 2.6 s, plus py4j shipping the 27,213-term
vocabulary through from_vocabulary). The registry keeps the
CountVectorizer.fit shape; "old" below IS the registry shape (also
called via the registry to keep the comparison honest), "new" is the
rejected native-vocab variant, inlined so the harness stays runnable.

Semantics note (why the output digest is invariant): the vocabulary
ORDER differs (native sorts count desc then term asc; MLlib's .top
breaks count ties in partition-iteration order), which changes feature
INDICES and therefore MinHashLSH candidate pairs — but every output
column is order-invariant: precision_ok is enforced by the exact
keyDistance filter (index-set Jaccard == shingle-set Jaccard, order
free), exact duplicates have identical vectors and always collide
(exact_recovered = n_exact_planted regardless of indexing), n_near_true
never touches MLlib, and near_recall_ok is a >=70% threshold that the
oracle checks at all three SFs (verified bit-exact post-change).
Variants alternate within ONE session; per-round pairs + mins + anchor.
"""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
ROUNDS = 4


def native_vocab_mllib(spark, sf_dir):
    from pyspark.ml.feature import CountVectorizerModel, MinHashLSH

    from spark_sql_flow_plugin_spark.caching import scope_caches
    from spark_sql_flow_plugin_spark.operators.dedup import (
        _SPARK_SHINGLES, _SPARK_TOKS, augmented_documents)
    from spark_sql_flow_plugin_spark.sources import load

    aug = augmented_documents(spark, sf_dir)
    _NGRAM3 = (
        "zip_with("
        "  slice(toks, 1, size(toks) - 2),"
        "  zip_with(slice(toks, 2, size(toks) - 2), slice(toks, 3, size(toks) - 2),"
        "           (y, z) -> concat(y, ' ', z)),"
        "  (x, yz) -> concat(x, ' ', yz)"
        ")"
    )
    shingled = (
        aug.select("doc_id", F.expr(_SPARK_TOKS).alias("toks"))
        .where(F.size("toks") >= 3)
        .select("doc_id", F.expr(_NGRAM3).alias("shingles"))
    )
    vocab_rows = (
        shingled.select(F.explode("shingles").alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    vocab = [
        r.gram for r in sorted(vocab_rows, key=lambda r: (-r.cnt, r.gram))
    ]
    cv = CountVectorizerModel.from_vocabulary(
        vocab, inputCol="shingles", outputCol="features", binary=True
    )
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
            ((F.col("doc_b") == F.col("doc_a") + 2000000)
             & (F.col("doc_a") < 1000000)).cast("long")
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
        ).agg(F.count(F.lit(1)).alias("near_recovered"))
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
            "n_exact_planted", "exact_recovered", "n_near_true",
            (F.col("near_recovered") * 10 >= F.col("n_near_true") * 7).alias(
                "near_recall_ok"
            ),
            "precision_ok",
        ),
        feats, found, sh,
    )


def main():
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.session import get_session

    spark = get_session("ab-cvnative", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    anchor = 1e9
    for i in range(3):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(crc32(md5(cast(id as string)))) s"
        ).collect()
        if i:
            anchor = min(anchor, time.time() - t0)
    reg_fn = _reg.queries()["dedup_minhash_mllib"]
    rounds = []
    for r in range(ROUNDS):
        pair = {}
        for tag, fn in (("old", reg_fn), ("new", native_vocab_mllib)):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, SF).count()
            pair[tag] = round(time.time() - t0, 3)
        rounds.append(pair)
    print(json.dumps({
        "anchor_md5_20m": round(anchor, 3),
        "rounds": rounds,
        "min_old": min(p["old"] for p in rounds),
        "min_new": min(p["new"] for p in rounds),
    }))


if __name__ == "__main__":
    main()
