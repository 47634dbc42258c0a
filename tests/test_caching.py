"""Persist hygiene: builder caches are scoped to the result DataFrame
(caching.scope_caches), so a long-lived session invoking builders
repeatedly does not accumulate storage memory (round-2 verdict fix).

CPython refcounting makes the release deterministic: dropping the last
reference to the result runs the weakref finalizer synchronously, which
unpersists every intermediate through its JVM handle.
"""

import gc

from spark_sql_flow_plugin_spark.operators import dedup, misc, text


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


def test_builder_caches_released_on_result_gc(spark, sf_dir):
    spark.catalog.clearCache()
    cm = _cache_manager(spark)
    assert cm.isEmpty()
    for builder in (
        text.text_vocab_stats,
        text.text_fingerprint_winnow,
        text.text_tfidf_top_terms,
        dedup.dedup_simhash,
        dedup.dedup_minhash_lsh,
        misc.cache_table_join,
    ):
        df = builder(spark, sf_dir)
        df.count()
        assert not cm.isEmpty(), f"{builder.__name__} should cache while alive"
        del df
        gc.collect()
        assert cm.isEmpty(), f"{builder.__name__} leaked cache entries"


def test_session_reuse_storage_stays_bounded(spark, sf_dir):
    """Repeated builder invocations in one session leave the persistent-RDD
    map empty once results are dropped — the round-2 'unbounded storage
    accumulation' scenario."""
    spark.catalog.clearCache()
    for _ in range(3):
        df = dedup.dedup_minhash_lsh(spark, sf_dir)
        df.count()
        del df
        gc.collect()
    assert _cache_manager(spark).isEmpty()
    # cached-plan entries gone implies the cached RDD blocks are
    # unpersisted; the SparkContext-level map must agree (modulo
    # localCheckpoint RDDs, which none of these builders use)
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    assert jmap.size() == 0, f"{jmap.size()} persistent RDDs leaked"
