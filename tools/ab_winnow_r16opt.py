"""Interleaved A/B: winnow gate-repartition, substring-spans unhex key,
dedup_exact unhex key. OLD = r16-close shapes inline; NEW = registry."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window

SF = "/root/testdata/sf0.1"
ROUNDS = 3


def old_winnow(spark, sf_dir):
    from spark_sql_flow_plugin_spark.caching import scope_caches
    from spark_sql_flow_plugin_spark.operators.dedup import (
        _WK, _WW, _winnow_fps_udf, _winnow_pairs)
    from spark_sql_flow_plugin_spark.sources import load

    d = load(spark, sf_dir, "documents")["documents"].select("doc_id", "text")
    excerpts = d.where(
        (F.col("doc_id") % 11 == 0) & (F.length("text") >= 80)
    ).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat(F.substring("text", 1, 80), F.lit(" tail")).alias("text"),
    )
    aug = d.union(excerpts).where(F.length("text") >= _WK + _WW)
    fps = aug.select(
        "doc_id", F.explode(_winnow_fps_udf()("text")).alias("f")
    ).persist()
    return scope_caches(_winnow_pairs(fps), fps)


def old_spans(spark, sf_dir):
    from spark_sql_flow_plugin_spark.operators.dedup import _ESUB_L
    from spark_sql_flow_plugin_spark.sources import load

    d = load(spark, sf_dir, "documents")["documents"]
    L = _ESUB_L
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN length(text) >= {L} THEN "
                f"sequence(1, length(text) - {L} + 1) "
                "ELSE array() END"
            )
        ).alias("pos"),
        "text",
    ).select(
        "doc_id", "pos",
        F.md5(F.expr(f"substr(text, pos, {L})")).alias("h"),
    )
    wh = Window.partitionBy("h")
    flagged = (
        grams.withColumn("_mn", F.min("doc_id").over(wh))
        .withColumn("_mx", F.max("doc_id").over(wh))
        .where(F.col("_mn") != F.col("_mx"))
        .select("doc_id", "pos")
    )
    wlag = Window.partitionBy("doc_id").orderBy("pos")
    wrun = wlag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = flagged.withColumn(
        "brk",
        F.when(
            F.col("pos")
            - F.coalesce(F.lag("pos", 1).over(wlag), F.col("pos") - F.lit(L + 1))
            > L,
            1,
        ).otherwise(0),
    ).withColumn("grp", F.sum("brk").over(wrun))
    spans = isl.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("s"), (F.max("pos") + F.lit(L - 1)).alias("e"),
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
            F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("dup_chars"),
            F.sum(F.col("e") - F.col("s") + 1).cast("double").alias("_dc"),
        )
        .join(d.select("doc_id", F.length("text").alias("_len")), "doc_id")
        .select(
            "doc_id", "n_dup_spans", "dup_chars",
            (F.col("_dc") / F.col("_len")).alias("dup_frac"),
        )
    )


def old_exact(spark, sf_dir):
    from spark_sql_flow_plugin_spark.operators.dedup import augmented_documents

    return (
        augmented_documents(spark, sf_dir)
        .groupBy(F.md5("text").alias("fp"), F.length("text").alias("tlen"))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
        .where(F.col("n_copies") > 1)
        .select("keeper", "n_copies")
    )


def main():
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.session import get_session

    spark = get_session("ab-winnow", cpus=32)
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
        ("winnow_old", old_winnow),
        ("winnow_new", qs["dedup_winnow_overlap"]),
        ("spans_old", old_spans),
        ("spans_new", qs["dedup_exact_substring_spans"]),
        ("exact_old", old_exact),
        ("exact_new", qs["dedup_exact"]),
    ]
    res = {name: [] for name, _ in variants}
    for r in range(ROUNDS):
        for name, fn in variants:
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, SF).count()
            res[name].append(round(time.time() - t0, 3))
    print(json.dumps({
        "anchor_md5_20m": round(anchor, 3),
        "rounds": res,
        "mins": {k: min(v) for k, v in res.items()},
    }))


if __name__ == "__main__":
    main()
