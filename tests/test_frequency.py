"""Two-pass exact heavy hitters: the Misra-Gries superset guarantee is the
only probabilistic-looking piece, so it gets direct property coverage — the
final output must be EXACT (equal to a plain GROUP BY ... HAVING) no matter
how the token stream is partitioned or batched."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from spark_sql_flow_plugin_spark.operators import frequency
from spark_sql_flow_plugin_spark.operators.text import _SPARK_WTOKS
from spark_sql_flow_plugin_spark.registry import queries


def _mg_run(tokens, batch_size):
    batches = (
        pd.DataFrame({"token": tokens[i : i + batch_size]})
        for i in range(0, len(tokens), batch_size)
    )
    (out,) = list(frequency._mg_candidates(batches))
    return set(out["token"])


@given(
    tokens=st.lists(st.integers(min_value=0, max_value=30).map(str), max_size=400),
    batch_size=st.integers(min_value=1, max_value=64),
)
@settings(max_examples=60, deadline=None)
def test_mg_superset_property(tokens, batch_size):
    # Every token with freq > n/(K+1) must survive, for ANY batch split.
    cand = _mg_run(tokens, batch_size)
    n = len(tokens)
    counts = pd.Series(tokens).value_counts() if tokens else pd.Series(dtype=int)
    heavy = {t for t, c in counts.items() if c * (frequency._MG_K + 1) > n}
    assert heavy <= cand


def test_mg_memory_bound():
    # Adversarial all-distinct stream: the summary never exceeds K counters.
    tokens = [f"t{i}" for i in range(5000)]
    cand = _mg_run(tokens, 97)
    assert len(cand) <= frequency._MG_K


def test_threshold_within_sketch_guarantee():
    # The exactness argument needs the output threshold divisor to sit
    # strictly inside the sketch's n/(K+1) coverage.
    assert frequency._HH_T < frequency._MG_K + 1


def test_heavy_hitters_exact_vs_full_groupby(spark, sf_dir):
    # The two-pass result must equal the unaffordable-at-scale full GROUP BY.
    got = {
        (r["token"], r["cnt"])
        for r in queries()["freq_heavy_hitters"](spark, sf_dir).collect()
    }
    tok = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.expr(_SPARK_WTOKS)).alias("token"))
    )
    n = tok.count()
    exact = {
        (r["token"], r["cnt"])
        for r in tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * frequency._HH_T > F.lit(n))
        .collect()
    }
    assert got == exact and len(got) > 0


def test_heavy_hitters_repartition_invariant(spark, sf_dir):
    # Candidate sets differ per partitioning; the OUTPUT must not.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = queries()["freq_heavy_hitters"](spark, sf_dir)
    tok = docs.repartition(13).select(
        F.explode(F.expr(_SPARK_WTOKS)).alias("token")
    )
    cand = (
        tok.mapInPandas(frequency._mg_candidates, "token string")
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    g = (
        tok.join(F.broadcast(cand), "token", "left")
        .groupBy(F.when(F.col("_c").isNotNull(), F.col("token")).alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = g.agg(F.sum("cnt").alias("n"))
    alt = (
        g.where(F.col("key").isNotNull())
        .crossJoin(F.broadcast(tot))
        .where(F.col("cnt") * frequency._HH_T > F.col("n"))
        .select(F.col("key").alias("token"), "cnt")
    )
    assert {tuple(r) for r in base.collect()} == {tuple(r) for r in alt.collect()}


def test_bloom_no_false_negatives(spark, sf_dir):
    # Bloom flags must be a superset of the exact n-gram decontamination
    # (false positives allowed by design, false negatives never).
    bloom = {
        r["doc_id"]: r["n_flagged_ngrams"]
        for r in queries()["decontaminate_bloom"](spark, sf_dir).collect()
    }
    exact = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in queries()["decontaminate_ngram"](spark, sf_dir).collect()
    }
    assert set(exact) <= set(bloom)
    for doc_id, n_exact in exact.items():
        assert bloom[doc_id] >= n_exact


def test_bpe_recursion_produces_standard_segmentations(spark):
    # known segmentations under the fixed merge table: drives the splice
    # algebra, rank tie-breaking (leftmost best pair), and fixpoint exit
    from spark_sql_flow_plugin_spark.operators.text import (
        _BPE_BIG,
        _BPE_MERGES,
        _SPARK_BPE_MERGES,
    )

    q = f"""
    WITH RECURSIVE bpe (w, s, iter) AS (
        SELECT w, regexp_extract_all(w, '(.)', 1) AS s, 0
        FROM (VALUES ('there'), ('that'), ('interesting'), ('ending'), ('x')) t(w)
        UNION ALL
        SELECT w,
               concat(slice(s, 1, idx - 1),
                      array(replace(element_at(pairs, idx), ' ', '')),
                      slice(s, idx + 2, size(s))) AS s,
               iter + 1
        FROM (
            SELECT w, s, iter, pairs,
                   CAST(array_position(ranks, array_min(ranks)) AS INT) AS idx,
                   array_min(ranks) AS best
            FROM (
                SELECT w, s, iter,
                       zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1),
                                (a, b) -> concat(a, ' ', b)) AS pairs,
                       zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1),
                                (a, b) -> coalesce(nullif(array_position({_SPARK_BPE_MERGES},
                                                         concat(a, ' ', b)), 0), {_BPE_BIG})) AS ranks
                FROM bpe)
        ) WHERE best < {_BPE_BIG})
    SELECT w, s FROM (
        SELECT w, s, iter, MAX(iter) OVER (PARTITION BY w) AS mx FROM bpe)
    WHERE iter = mx
    """
    got = {r.w: list(r.s) for r in spark.sql(q).collect()}
    # reference segmentations computed by hand against _BPE_MERGES
    assert got["x"] == ["x"]
    assert got["that"] == ["that"]       # t h -> th; a t? no: th a t -> 'th at'
    assert got["there"] == ["there"]     # th e + r e -> the re -> there
    assert got["ending"] == ["en", "d", "ing"]
    assert got["interesting"] == ["in", "t", "e", "re", "st", "ing"]
    # python reference implementation agrees on every vocabulary word shape
    def py_bpe(word):
        s = list(word)
        while True:
            ranks = [
                _BPE_MERGES.index(f"{a} {b}") if f"{a} {b}" in _BPE_MERGES else None
                for a, b in zip(s, s[1:])
            ]
            live = [r for r in ranks if r is not None]
            if not live:
                return s
            i = ranks.index(min(live))
            s = s[:i] + [s[i] + s[i + 1]] + s[i + 2 :]

    for w, toks in got.items():
        assert toks == py_bpe(w), w


def test_bpe_recursion_fuzz_against_python_reference(spark):
    # 60 random alphanumeric words through the SQL recursion in ONE query,
    # compared against the python reference merge loop
    import random

    from spark_sql_flow_plugin_spark.operators.text import (
        _BPE_BIG,
        _BPE_MERGES,
        _SPARK_BPE_MERGES,
    )

    rng = random.Random(17)
    alpha = "abcdefghinorst"
    words = sorted(
        {
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 14)))
            for _ in range(60)
        }
    )
    values = ", ".join(f"('{w}')" for w in words)
    q = f"""
    WITH RECURSIVE bpe (w, s, iter) AS (
        SELECT w, regexp_extract_all(w, '(.)', 1) AS s, 0
        FROM (VALUES {values}) t(w)
        UNION ALL
        SELECT w,
               concat(slice(s, 1, idx - 1),
                      array(replace(element_at(pairs, idx), ' ', '')),
                      slice(s, idx + 2, size(s))) AS s,
               iter + 1
        FROM (
            SELECT w, s, iter, pairs,
                   CAST(array_position(ranks, array_min(ranks)) AS INT) AS idx,
                   array_min(ranks) AS best
            FROM (
                SELECT w, s, iter,
                       zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1),
                                (a, b) -> concat(a, ' ', b)) AS pairs,
                       zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1),
                                (a, b) -> coalesce(nullif(array_position({_SPARK_BPE_MERGES},
                                                         concat(a, ' ', b)), 0), {_BPE_BIG})) AS ranks
                FROM bpe)
        ) WHERE best < {_BPE_BIG})
    SELECT w, s FROM (
        SELECT w, s, iter, MAX(iter) OVER (PARTITION BY w) AS mx FROM bpe)
    WHERE iter = mx
    """
    got = {r.w: list(r.s) for r in spark.sql(q).collect()}

    def py_bpe(word):
        s = list(word)
        while True:
            ranks = [
                _BPE_MERGES.index(f"{a} {b}") if f"{a} {b}" in _BPE_MERGES else None
                for a, b in zip(s, s[1:])
            ]
            live = [r for r in ranks if r is not None]
            if not live:
                return s
            i = ranks.index(min(live))
            s = s[:i] + [s[i] + s[i + 1]] + s[i + 2 :]

    assert set(got) == set(words)
    for w in words:
        assert got[w] == py_bpe(w), w
