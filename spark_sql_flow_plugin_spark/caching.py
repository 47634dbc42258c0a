"""Cache-lifetime scoping for query builders.

Builders persist() intermediates that are consumed by several downstream
branches (signature tables, exploded token streams) or that must act as a
materialization barrier against optimizer fusion. The registry contract
returns a LAZY DataFrame — the action happens in the caller — so the
builder cannot unpersist before returning, and a bare ``persist()`` pins
the cache in the CacheManager for the life of the session: a library user
invoking builders repeatedly accumulates storage memory without bound
(round-2 verdict, "What's wrong" #2).

``scope_caches`` ties each intermediate's cache lifetime to the RESULT
DataFrame instead: a ``weakref.finalize`` on the result unpersists every
intermediate the moment the result object is garbage-collected. Under
CPython refcounting that is deterministic — the cache lives exactly as
long as something can still run the query — and it needs no change to the
builder contract or the physical plans (the intermediates stay ordinary
columnar InMemoryRelations while alive).

DOCUMENTED EXCEPTION to the lazy contract (r14 ADVICE): a few builders
EAGERLY materialize an intermediate at build time — count() on a
persisted frame, or a driver-side collect for a guard/threshold — when
either (a) multiple consumer subtrees would otherwise RACE to compute
the cache (AQE never reuses broadcast subtrees across jobs, and lazy
caches race — the r14 triangle profile), or (b) a loud-fail budget must
be checked before the main action (dedup_ngram_jaccard's set-pair
tripwire, graphs' k-threshold). Such builders pay their pipeline cost at
construction, so an explain-only caller of those specific entries also
pays it; each eager site carries a comment naming this trade-off.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def _unpersist_all(jdfs) -> None:
    for jdf in jdfs:
        try:
            jdf.unpersist(False)
        except Exception:
            # the SparkSession (or its JVM) is already gone — nothing to free
            pass


def scope_caches(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Unpersist each ``cached`` DataFrame when ``result`` is GC'd.

    The finalizer holds the JVM-side handles (not the Python DataFrames),
    so it keeps no reference to ``result`` and cannot leak a cycle.
    Unpersisting an already-unpersisted plan is a no-op, so overlapping
    scopes on a shared intermediate are safe.
    """
    weakref.finalize(result, _unpersist_all, [c._jdf for c in cached])
    return result
