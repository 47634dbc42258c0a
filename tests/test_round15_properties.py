"""Round-15 property tests for the dedup_ngram_jaccard restructure
(distinct gram-set grain + bitmask algebra + triangular grid-blocked
pair join; r14 verdict item #2).

The oracle matrices prove value equality end-to-end; these tests pin
the NEW failure modes the restructure introduced:

(a) the stratum set-pair budget trips loudly (RuntimeError, not a hang)
    when distinct-set pair mass exceeds _NGRAM_PAIR_BUDGET;
(b) the bitmask vocabulary cap trips loudly past _NGRAM_VOCAB_CAP;
(c) the triangular grid emits every doc pair EXACTLY once — a wrong
    diagonal filter would duplicate same-block pairs B times, and a
    wrong cell assignment would drop cross-block pairs (completeness is
    covered by the oracle; uniqueness is NOT, because the checker
    compares multisets and DuckDB would have to be wrong in the same
    multiplicity — so pin it here);
(d) the grid is B-invariant: B=1 (no blocking, single cell per
    stratum) produces the identical pair multiset.
"""

import pytest

from pyspark.sql import functions as F

import spark_sql_flow_plugin_spark.operators.dedup as dedup


def test_pair_budget_trips(spark, sf_dir, monkeypatch):
    monkeypatch.setattr(dedup, "_NGRAM_PAIR_BUDGET", 1)
    with pytest.raises(RuntimeError, match="pair budget"):
        dedup.dedup_ngram_jaccard(spark, sf_dir)


def test_vocab_cap_trips(spark, sf_dir, monkeypatch):
    monkeypatch.setattr(dedup, "_NGRAM_VOCAB_CAP", 3)
    with pytest.raises(RuntimeError, match="vocabulary cap"):
        dedup.dedup_ngram_jaccard(spark, sf_dir)


def test_grid_emits_each_pair_exactly_once(spark, sf_dir):
    out = dedup.dedup_ngram_jaccard(spark, sf_dir)
    dup = (
        out.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert dup == 0
    # richness: the planted near-dup copies guarantee output pairs
    assert out.count() > 0


def test_grid_b_invariant(spark, sf_dir, monkeypatch):
    base = sorted(
        map(tuple, dedup.dedup_ngram_jaccard(spark, sf_dir).collect())
    )
    monkeypatch.setattr(dedup, "_NGRAM_GRID_B", 1)
    nogrid = sorted(
        map(tuple, dedup.dedup_ngram_jaccard(spark, sf_dir).collect())
    )
    assert base == nogrid


def test_python_datasource_batch_equals_rows():
    """The Arrow RecordBatch read path (r15 perf: 7.7 -> 0.9 s) must stay
    in lockstep with synth_row — the closed form the DuckDB oracle
    reproduces. Compares the batch columns against per-row tuples for a
    boundary-heavy range."""
    from pyspark.sql.datasource import InputPartition

    from spark_sql_flow_plugin_spark.sources.synthetic import (
        SyntheticDocsReader,
        synth_row,
    )

    reader = SyntheticDocsReader({"rows": "100"})
    got = []
    for part in reader.partitions():
        for batch in reader.read(part):
            got.extend(zip(*(c.to_pylist() for c in batch.columns)))
    assert got == [synth_row(i) for i in range(100)]
    # zero-row partition yields an empty batch, not an error
    empty = list(SyntheticDocsReader({"rows": "0"}).partitions())
    assert len(empty) == 1
    (b,) = SyntheticDocsReader({"rows": "0"}).read(InputPartition((0, 0)))
    assert b.num_rows == 0


def test_novelty_curve_completeness(spark, sf_dir):
    """Completeness, not just soundness (r13 value-gate lesson): summed
    n_novel must equal the distinct gram universe (every gram is novel
    exactly once), and the earliest eligible doc is 100% novel."""
    from pyspark.sql import functions as F

    from spark_sql_flow_plugin_spark.operators.dedup import (
        _NGRAM_N,
        _SPARK_TOKS,
        dedup_novelty_curve,
    )
    from spark_sql_flow_plugin_spark.sources.tables import load

    out = dedup_novelty_curve(spark, sf_dir).collect()
    assert out
    d = load(spark, sf_dir, "documents")["documents"]
    universe = (
        d.select(F.expr(_SPARK_TOKS).alias("toks"))
        .where(F.size("toks") >= _NGRAM_N)
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_NGRAM_N - 1}), "
                    f"i -> md5(concat_ws(' ', slice(toks, i, {_NGRAM_N}))))"
                )
            ).alias("fp")
        )
        .agg(F.countDistinct("fp"))
        .collect()[0][0]
    )
    assert sum(r.n_novel for r in out) == universe
    first = min(out, key=lambda r: r.doc_id)
    assert first.n_novel == first.n_grams and first.novelty_q6 == 1_000_000
    # richness: at least one doc must be PARTIALLY novel at this SF
    assert any(0 < r.n_novel < r.n_grams for r in out)
