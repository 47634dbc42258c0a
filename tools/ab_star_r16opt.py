"""Interleaved A/B for the r16-opt star-round width fix: OLD = r16-close
star helpers (union expansion + session-width distinct), NEW = registry."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
ROUNDS = 3


def _orient(edges):
    return edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))


def _old_large(edges, npart):
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.repartition(npart, "u")
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _old_small(edges, npart):
    ori = _orient(edges).repartition(npart, "u")
    mins = ori.groupBy("u").agg(F.min("v").alias("m"))
    nbr = (
        ori.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return nbr.union(mins.select("u", F.col("m").alias("v"))).distinct()


def _old_two_phase(spark, edges, npart):
    from spark_sql_flow_plugin_spark.operators.dedup import _STAR_MAX_ROUNDS

    def _sig(df):
        return df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()

    cur = _orient(edges).distinct().localCheckpoint()
    sig = _sig(cur)
    converged = False
    for _ in range(_STAR_MAX_ROUNDS):
        prev = cur
        nxt = _old_small(_old_large(cur, npart), npart).localCheckpoint()
        nsig = _sig(nxt)
        cur = nxt
        if (nsig["n"], nsig["h"]) == (sig["n"], sig["h"]):
            if nxt.exceptAll(prev).limit(1).count() == 0:
                converged = True
                break
        sig = nsig
    assert converged
    return (
        cur.select(F.col("u").alias("node"), F.col("v").alias("comp"))
        .union(cur.select(F.col("v").alias("node"), F.col("v").alias("comp")))
        .distinct()
    )


def old_star(spark, sf_dir):
    from spark_sql_flow_plugin_spark.operators.dedup import dedup_minhash_lsh

    lsh = dedup_minhash_lsh(spark, sf_dir)
    edges = lsh.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).localCheckpoint()
    del lsh
    n_edges = edges.count()
    npart = max(1, -(-n_edges // 2_000_000))
    labels = _old_two_phase(spark, edges, npart)
    return (
        labels.groupBy("comp")
        .agg(F.count("*").alias("n_docs"))
        .select(F.col("comp").alias("component"), "n_docs")
    )


def main():
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.session import get_session

    spark = get_session("ab-star", cpus=32)
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
        ("star_old", old_star),
        ("star_new", qs["dedup_components_star"]),
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
