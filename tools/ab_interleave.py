"""Interleaved A/B for the bm25_topk / lm_bigram_score restructure (r15
item #1). OLD = r14 persist-based shapes (inlined below), NEW = current
registry implementations. Variants alternate within ONE session so host
drift hits both equally; reports min + per-round pairs."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window

SF = "/root/testdata/sf0.1"
ROUNDS = 3


def old_bm25(spark, sf_dir):
    from spark_sql_flow_plugin_spark.operators.text import (
        _SPARK_WTOKS, _BM25_QUERIES, _BM25_K, _bm25_term_sql)
    from spark_sql_flow_plugin_spark.sources.tables import load
    from spark_sql_flow_plugin_spark.caching import scope_caches
    d = load(spark, sf_dir, "documents")["documents"]
    toks = d.select("doc_id", F.explode(F.expr(_SPARK_WTOKS)).alias("tok")).persist()
    dl = d.select("doc_id", F.expr(f"size({_SPARK_WTOKS})").cast("bigint").alias("len_d"))
    stats = dl.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                   F.sum("len_d").cast("bigint").alias("s")).collect()[0]
    n_docs, sum_len = int(stats.n), int(stats.s)
    qterms = spark.createDataFrame(
        [(q, t) for q, terms in _BM25_QUERIES for t in terms], "query_id int, term string")
    tf = (toks.join(F.broadcast(qterms), toks.tok == qterms.term)
          .groupBy("query_id", "term", "doc_id")
          .agg(F.count(F.lit(1)).cast("bigint").alias("tf")))
    dfq = (toks.join(F.broadcast(qterms.select("term").distinct()), toks.tok == F.col("term"))
           .groupBy("term").agg(F.countDistinct("doc_id").cast("bigint").alias("df")))
    term = F.expr(_bm25_term_sql("tf", "df", "len_d", f"{n_docs}L", f"{sum_len}L", "DIV"))
    sc = (tf.join(dl, "doc_id").join(dfq, "term")
          .groupBy("query_id", "doc_id").agg(F.sum(term).cast("bigint").alias("score_q9")))
    w = Window.partitionBy("query_id").orderBy(F.col("score_q9").desc(), F.col("doc_id").asc())
    out = (sc.withColumn("rank", F.row_number().over(w).cast("int"))
           .where(F.col("rank") <= _BM25_K)
           .select("query_id", "rank", "doc_id", "score_q9"))
    return scope_caches(out, toks)


def old_lm(spark, sf_dir):
    from spark_sql_flow_plugin_spark.operators.text import _SPARK_WTOKS, _SPARK_BIGRAMS
    from spark_sql_flow_plugin_spark.sources.tables import load
    from spark_sql_flow_plugin_spark.caching import scope_caches
    d = load(spark, sf_dir, "documents")["documents"]
    big = (d.select("doc_id", F.expr(_SPARK_WTOKS).alias("toks"))
           .where(F.expr("size(toks)") >= 2)
           .select("doc_id", F.explode(F.expr(_SPARK_BIGRAMS)).alias("p"))
           .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg"))
           .persist())
    c12 = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (big.join(c12, "bg").join(c1, "w1").groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_bigrams"),
                   F.sum(F.expr("CAST(FLOOR(1e9 * (CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))) AS BIGINT)"))
                   .cast("bigint").alias("lm_score_q9")))
    return scope_caches(scored, big)


def main():
    from spark_sql_flow_plugin_spark.session import get_session
    from spark_sql_flow_plugin_spark import registry as _reg
    spark = get_session("ab", cpus=32)
    qs = _reg.queries()
    variants = {
        "bm25.old": old_bm25, "bm25.new": qs["bm25_topk"],
        "lm.old": old_lm, "lm.new": qs["lm_bigram_score"],
    }
    # warmup: one pass of everything + anchor
    for fn in variants.values():
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    res = {k: [] for k in variants}
    anchors = []
    for r in range(ROUNDS):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(crc32(md5(cast(id as string)))) s").collect()
        anchors.append(round(time.time() - t0, 3))
        for k, fn in variants.items():
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            res[k].append(round(time.time() - t0, 3))
    print(json.dumps({"anchors": anchors,
                      **{k: {"min": min(v), "runs": v} for k, v in res.items()}}))


if __name__ == "__main__":
    main()
