"""Variant matrix for the two cached-frame queries (r15 item #1):
  v1 = r14 shape (persist, no materialize)
  v2 = persist + count() materialize
  v3 = repartition(32,doc_id) INSIDE the cached plan (post-explode) + count()
  v4 = tokenize-after-doc-grain-shuffle inside cache + count()
Interleaved in one session, matched anchors."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F, Window

SF = "/root/testdata/sf0.1"
ROUNDS = 3


def _bm25_from_toks(spark, d, toks, materialize):
    from spark_sql_flow_plugin_spark.operators.text import (
        _SPARK_WTOKS, _BM25_QUERIES, _BM25_K, _bm25_term_sql)
    from spark_sql_flow_plugin_spark.caching import scope_caches
    if materialize:
        toks.count()
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


def bm25_v(spark, sf_dir, variant):
    from spark_sql_flow_plugin_spark.operators.text import _SPARK_WTOKS
    from spark_sql_flow_plugin_spark.sources.tables import load
    d = load(spark, sf_dir, "documents")["documents"]
    P = spark.sparkContext.defaultParallelism
    base = d.select("doc_id", F.explode(F.expr(_SPARK_WTOKS)).alias("tok"))
    if variant == 1:
        toks = base.persist(); mat = False
    elif variant == 2:
        toks = base.persist(); mat = True
    elif variant == 3:
        toks = base.repartition(P, "doc_id").persist(); mat = True
    else:
        toks = (d.select("doc_id", "text").repartition(P, "doc_id")
                .select("doc_id", F.explode(F.expr(_SPARK_WTOKS)).alias("tok")).persist())
        mat = True
    return _bm25_from_toks(spark, d, toks, mat)


def _lm_from_big(spark, big, materialize):
    from spark_sql_flow_plugin_spark.caching import scope_caches
    if materialize:
        big.count()
    c12 = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (big.join(c12, "bg").join(c1, "w1").groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_bigrams"),
                   F.sum(F.expr("CAST(FLOOR(1e9 * (CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))) AS BIGINT)"))
                   .cast("bigint").alias("lm_score_q9")))
    return scope_caches(scored, big)


def lm_v(spark, sf_dir, variant):
    from spark_sql_flow_plugin_spark.operators.text import _SPARK_WTOKS, _SPARK_BIGRAMS
    from spark_sql_flow_plugin_spark.sources.tables import load
    d = load(spark, sf_dir, "documents")["documents"]
    P = spark.sparkContext.defaultParallelism
    pairs = (d.select("doc_id", F.expr(_SPARK_WTOKS).alias("toks"))
             .where(F.expr("size(toks)") >= 2)
             .select("doc_id", F.explode(F.expr(_SPARK_BIGRAMS)).alias("p"))
             .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg")))
    if variant == 1:
        big = pairs.persist(); mat = False
    elif variant == 2:
        big = pairs.persist(); mat = True
    elif variant == 3:
        big = pairs.repartition(P, "doc_id").persist(); mat = True
    else:
        big = (d.select("doc_id", "text").repartition(P, "doc_id")
               .select("doc_id", F.expr(_SPARK_WTOKS).alias("toks"))
               .where(F.expr("size(toks)") >= 2)
               .select("doc_id", F.explode(F.expr(_SPARK_BIGRAMS)).alias("p"))
               .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg"))
               .persist())
        mat = True
    return _lm_from_big(spark, big, mat)


def main():
    from spark_sql_flow_plugin_spark.session import get_session
    spark = get_session("ab2", cpus=32)
    variants = {}
    for v in (1, 2, 3, 4):
        variants[f"bm25.v{v}"] = (bm25_v, v)
        variants[f"lm.v{v}"] = (lm_v, v)
    for fn, v in variants.values():
        fn(spark, SF, v).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    res = {k: [] for k in variants}
    anchors = []
    for r in range(ROUNDS):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(crc32(md5(cast(id as string)))) s").collect()
        anchors.append(round(time.time() - t0, 3))
        for k, (fn, v) in variants.items():
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, SF, v).write.format("noop").mode("overwrite").save()
            res[k].append(round(time.time() - t0, 3))
    print(json.dumps({"anchors": anchors,
                      **{k: min(v) for k, v in res.items()}}))


if __name__ == "__main__":
    main()
