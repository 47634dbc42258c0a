"""Interleaved A/B for the r17 dedup_ngram_jaccard mask build: OLD =
r16-close shape (explode grams + broadcast vocab join + doc-grain bit_or
re-aggregation), NEW = current registry builder (literal gram->gid map +
per-doc aggregate() mask words, no explode/join/doc-grain exchange).
Collected outputs asserted equal across arms.

Usage: python tools/ab_ngrammask_r17opt.py [sf_dir] [rounds]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def old_ngram(spark, sf_dir):
    from spark_sql_flow_plugin_spark.caching import scope_caches
    from spark_sql_flow_plugin_spark.operators.dedup import (
        _NGRAM_GRID_B, _NGRAM_PAIR_BUDGET, _NGRAM_VOCAB_CAP, _SPARK_CGRAMS,
        augmented_documents)
    from spark_sql_flow_plugin_spark.sources import load

    docs = (
        load(spark, sf_dir, "documents")["documents"]
        .select(F.col("doc_id").alias("orig_id"), "source")
    )
    aug = augmented_documents(spark, sf_dir)
    n_parts = 2 * spark.sparkContext.defaultParallelism
    g = (
        aug.join(docs, (aug["doc_id"] % 1000000) == docs["orig_id"])
        .where(F.length(aug["text"]) >= 3)
        .select(
            aug["doc_id"].alias("doc_id"),
            "source",
            F.floor(F.length(aug["text"]) / 64).alias("lbucket"),
            F.expr(_SPARK_CGRAMS).alias("grams"),
        )
        .persist()
    )
    gram_rows = g.select(F.explode("grams").alias("gram")).distinct().collect()
    grams_sorted = sorted(r.gram for r in gram_rows)
    n_vocab = len(grams_sorted)
    assert 0 < n_vocab <= _NGRAM_VOCAB_CAP
    vocab = spark.createDataFrame(
        [(gm, i) for i, gm in enumerate(grams_sorted)], "gram string, gid int"
    )
    n_words = (n_vocab + 63) // 64
    mask_cols = [f"m{w}" for w in range(n_words)]
    doc_masks = (
        g.select(
            "doc_id", "source", "lbucket",
            F.size("grams").cast("int").alias("sz"),
            F.explode("grams").alias("gram"),
        )
        .join(F.broadcast(vocab), "gram")
        .groupBy("doc_id", "source", "lbucket", "sz")
        .agg(*[
            F.expr(
                f"bit_or(IF(gid DIV 64 = {w}, "
                "shiftleft(1L, CAST(gid % 64 AS INT)), 0L))"
            ).alias(c)
            for w, c in enumerate(mask_cols)
        ])
    )
    sets = (
        doc_masks.groupBy("source", "lbucket", "sz", *mask_cols)
        .agg(F.array_sort(F.collect_list("doc_id")).alias("members"))
        .withColumn("set_id", F.element_at("members", 1))
        .withColumn(
            "blk",
            F.pmod(F.xxhash64("set_id"), F.lit(_NGRAM_GRID_B)).cast("int"),
        )
        .persist()
    )
    budget_row = (
        sets.groupBy("source", "lbucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) / 2")).cast("bigint").alias("pairs"))
        .collect()[0]
    )
    assert int(budget_row.pairs or 0) <= _NGRAM_PAIR_BUDGET
    within = (
        sets.where(F.size("members") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, size(members) - 1), "
                    "i -> transform(slice(members, i + 1, size(members) - i), "
                    "y -> struct(element_at(members, i) AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select(
            F.col("p.a").alias("doc_a"),
            F.col("p.b").alias("doc_b"),
            F.lit(1.0).alias("jacc"),
        )
    )
    B = _NGRAM_GRID_B
    cells = sets.withColumn(
        "cell",
        F.explode(
            F.expr(
                f"transform(sequence(0, {B - 1}), "
                "s -> struct(least(blk, CAST(s AS INT)) AS p, "
                "greatest(blk, CAST(s AS INT)) AS q))"
            )
        ),
    ).repartition(n_parts, "source", "lbucket", "cell")
    a, b = cells.alias("a"), cells.alias("b")
    inter_col = None
    for c in mask_cols:
        t = F.bit_count(F.col(f"a.{c}").bitwiseAND(F.col(f"b.{c}")))
        inter_col = t if inter_col is None else inter_col + t
    inter = inter_col.cast("int")
    union_n = F.col("a.sz") + F.col("b.sz") - inter
    jacc = inter.cast("double") / union_n
    pair_sets = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.lbucket") == F.col("b.lbucket"))
            & (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.set_id") < F.col("b.set_id")),
        )
        .where(
            (F.col("a.blk") != F.col("b.blk"))
            | ((F.col("a.cell.p") == F.col("a.blk"))
               & (F.col("a.cell.q") == F.col("a.blk")))
        )
        .where(jacc >= 0.55)
        .select(
            F.col("a.members").alias("ma"),
            F.col("b.members").alias("mb"),
            F.round(jacc, 6).alias("jacc"),
        )
    )
    cross = (
        pair_sets.select(F.explode("ma").alias("da"), "mb", "jacc")
        .select("da", F.explode("mb").alias("db"), "jacc")
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "jacc",
        )
    )
    return scope_caches(within.unionByName(cross), g, sets)


def main():
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.session import get_session

    spark = get_session("ab-ngrammask", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    anchor = 1e9
    for i in range(3):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(crc32(md5(cast(id as string)))) s"
        ).collect()
        if i:
            anchor = min(anchor, time.time() - t0)
    variants = [
        ("ngram_old", old_ngram),
        ("ngram_new", _reg.queries()["dedup_ngram_jaccard"]),
    ]
    res = {n: [] for n, _ in variants}
    digests = {}
    check_rows = ROUNDS <= 2 or "sf0.1" in SF
    for r in range(ROUNDS):
        for name, fn in variants:
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, SF)
            if check_rows and r == 0:
                got = sorted(map(str, df.collect()))
                digests[name] = got
            else:
                df.count()
            res[name].append(round(time.time() - t0, 3))
    if check_rows:
        assert digests["ngram_old"] == digests["ngram_new"], "OUTPUT MISMATCH"
    print(json.dumps({
        "sf_dir": SF,
        "anchor_md5_20m": round(anchor, 3),
        "rows_equal": bool(check_rows),
        "rounds": res,
        "mins": {k: min(v) for k, v in res.items()},
    }))


if __name__ == "__main__":
    main()
