"""Interleaved A/B for the size-bounded tokenize-battery spread gates
(r16-opt continuation): OLD = un-spread corpus read (identity spread via
monkeypatch — the r16-close shape), NEW = current registry with the
min_bytes=2MiB gate. Run at sf1 (5.9 MB documents, gate fires) — the
regime where the r16-opt unconditional-gate A/B at sf0.1 measured
neutral-to-worse was 0.58 MB, below the gate floor. Alternates inside
one JVM, min + per-round pairs reported."""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf1"
ROUNDS = 3
QUERIES = [
    "bm25_topk",
    "text_tfidf_top_terms",
    "lm_bigram_score",
    "lm_kneser_ney_score",
    "bpe_tokenize_counts",
    "tokenizer_fertility_stats",
    "bpe_train_merges",
    "quality_train_logreg",
]


def main():
    from spark_sql_flow_plugin_spark.operators import text as _text
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.session import get_session

    real_spread = _text.spread
    ident_spread = lambda spark, df, sf_dir, table, *keys, **kw: df

    spark = get_session("ab-textspread", cpus=32)
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
        for tag, fn in (("old", ident_spread), ("new", real_spread)):
            # text.py binds `spread` at module import; patch the module
            # attribute the builders resolve at call time
            _text.spread = fn
            for q in QUERIES:
                spark.catalog.clearCache()
                t0 = time.time()
                qs[q](spark, SF).count()
                res.setdefault(f"{q}:{tag}", []).append(
                    round(time.time() - t0, 3))
    _text.spread = real_spread
    print(json.dumps({
        "sf_dir": SF,
        "anchor_md5_20m": round(anchor, 3),
        "rounds": res,
        "mins": {k: min(v) for k, v in res.items()},
    }))


if __name__ == "__main__":
    main()
