"""Frequent-items operators for corpus-scale token statistics (NEW — no
reference counterpart; BASELINE.json north star).

``freq_heavy_hitters`` is the classic two-pass exact heavy-hitters pattern a
100 TB pipeline uses when a full ``GROUP BY token`` is unaffordable (the
token stream has billions of distinct keys, but only the few hundred frequent
ones matter):

- **Pass 1** runs a *mergeable* Misra-Gries summary per partition
  (Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries",
  PODS'12): each partition keeps at most ``_MG_K`` counters, merging exact
  per-Arrow-batch ``value_counts`` into the summary and compressing by
  subtracting the (K+1)-th largest count.  The guarantee is that any token
  with partition frequency > n_i/(K+1) survives partition i, and since a
  global frequency f > n/(K+1) forces f_i > n_i/(K+1) in at least one
  partition, the union of per-partition candidates is a SUPERSET of every
  global heavy hitter.  Memory is O(K) per task regardless of corpus size.
- **Pass 2** re-scans the token stream once, broadcast-joins the tiny
  candidate set, and computes EXACT counts for candidates (plus the grand
  total in the same scan via a null-key bucket).  The final filter
  ``cnt * _HH_T > n`` with ``_HH_T < _MG_K + 1`` makes the output exactly
  ``{token : freq(token) > n/_HH_T}`` — independent of partitioning, batch
  boundaries, or which extra candidates pass 1 happened to emit.

The result is therefore deterministic and bit-exact against a plain
``GROUP BY ... HAVING`` oracle, while the Spark plan never materializes a
full-width token aggregation: the only shuffles are over ≤ K·partitions
candidate rows plus one null-key row per task.

Scale posture (asserted in tests/test_scale_plans.py):
- pass 1 is shuffle-free (explode + mapInPandas are row/partition-local);
- pass 2's join is a broadcast hash join (corpus side never shuffles);
- the final aggregation's input is the candidate-or-null keyed stream,
  partially aggregated map-side to ≤ (K+1) rows per task.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from ..caching import scope_caches
from ..partitioning import SPREAD_MIN_BYTES as _SPREAD_MIN_BYTES
from ..partitioning import spread
from ..registry import register
from ..sources import load
from .text import _DUCK_WTOKS, _SPARK_WTOKS

# Misra-Gries counter capacity (pass-1 memory bound per task) and the final
# heavy-hitter threshold divisor.  Correctness requires _HH_T < _MG_K + 1 so
# the candidate superset property covers every token the filter can emit.
_MG_K = 512
_HH_T = 400


def _mg_candidates(batches):
    """Mergeable Misra-Gries over one partition's token batches.

    Vectorized: exact value_counts per Arrow batch, pandas add-merge into the
    running summary, compress to _MG_K counters by subtracting the (K+1)-th
    largest count (dropping non-positive residuals).  Total undercount is
    bounded by n_partition/(_MG_K+1), which is all the superset guarantee
    needs.
    """
    summ = pd.Series(dtype="int64")
    for pdf in batches:
        vc = pdf["token"].value_counts()
        if vc.empty:
            continue
        summ = summ.add(vc, fill_value=0)
        if len(summ) > _MG_K:
            kth = summ.nlargest(_MG_K + 1).iloc[-1]
            summ = summ[summ > kth] - kth
    yield pd.DataFrame({"token": summ.index.to_numpy(dtype=object)})


@register(
    "freq_heavy_hitters",
    f"""
    WITH toks AS (
        SELECT {_DUCK_WTOKS} AS toks FROM documents),
    tok AS (SELECT unnest(toks) AS token FROM toks),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM tok, tot
    GROUP BY token, n
    HAVING COUNT(*) * {_HH_T} > n
    """,
    "frequency",
    "llm-pipeline",
    "bench",
)
def freq_heavy_hitters(spark, sf_dir):
    """Exact tokens with frequency > total/_HH_T, without a full token GROUP BY."""
    docs = load(spark, sf_dir, "documents")["documents"]
    # gate-spread before tokenize+MG sketch (partitioning.spread): the
    # single-row-group scan would run the whole pass-1 sketch on one
    # core. The Misra-Gries superset guarantee is per-partition, so the
    # candidate set stays a superset under ANY partitioning and the
    # exact verify pass yields identical output. Size-bounded like the
    # tokenize-battery call sites: below _SPREAD_MIN_BYTES the two extra
    # passes over the exchange cost more than the single-core sketch
    # (close benches measured 0.63 -> 0.95 s at sf0.1 ungated).
    docs = spread(
        spark, docs, sf_dir, "documents", "doc_id",
        min_bytes=_SPREAD_MIN_BYTES,
    )
    tok = docs.select(
        F.explode(F.expr(_SPARK_WTOKS)).alias("token")
    )

    # Pass 1: bounded-memory candidate sketch per partition (no shuffle).
    cand = (
        tok.mapInPandas(_mg_candidates, "token string")
        .distinct()
        .withColumn("_c", F.lit(1))
    )

    # Pass 2: one exact scan.  Candidate tokens keep their identity; all
    # other tokens fold into a single NULL key per task (map-side partial
    # aggregation), which also yields the grand total in the same pass.
    # g is tiny (<= K*partitions + 1 rows) and consumed twice (output rows
    # + grand total) — persist it, or both consumers re-run the corpus
    # scan AND the pass-1 sketch (the executed plan showed 4 corpus scans
    # without this; with it, exactly the two passes the algorithm promises)
    g = (
        tok.join(F.broadcast(cand), "token", "left")
        .groupBy(
            F.when(F.col("_c").isNotNull(), F.col("token")).alias("key")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    tot = g.agg(F.sum("cnt").alias("n"))
    return scope_caches(
        g.where(F.col("key").isNotNull())
        .crossJoin(F.broadcast(tot))
        .where(F.col("cnt") * _HH_T > F.col("n"))
        .select(F.col("key").alias("token"), F.col("cnt")),
        g,
    )
