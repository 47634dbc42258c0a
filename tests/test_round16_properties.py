"""Round-16 property tests pinning the r15 ADVICE fixes:

(a) the dedup_ngram_jaccard tripwires (vocab cap / pair budget) must
    UNPERSIST their eager caches before propagating — a tripped budget
    in a long-lived registry session must not pin g/sets forever;
(b) an empty gram universe (every doc shorter than one trigram) returns
    an empty, correctly-typed frame instead of an opaque
    groupBy().agg(*[]) failure, and leaves no cache behind;
(c) stage_events refuses workdir == sf_dir (the re-stage path deletes
    before it reads — aliasing them would destroy the source) and never
    deletes files it did not create in a shared workdir.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import spark_sql_flow_plugin_spark.operators.dedup as dedup
from spark_sql_flow_plugin_spark import stream_fuzz


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


def test_pair_budget_trip_unpersists(spark, sf_dir, monkeypatch):
    assert _cache_manager(spark).isEmpty()
    monkeypatch.setattr(dedup, "_NGRAM_PAIR_BUDGET", 1)
    with pytest.raises(RuntimeError, match="pair budget"):
        dedup.dedup_ngram_jaccard(spark, sf_dir)
    assert _cache_manager(spark).isEmpty(), (
        "pair-budget trip leaked persisted frames (g and/or sets)"
    )


def test_vocab_cap_trip_unpersists(spark, sf_dir, monkeypatch):
    assert _cache_manager(spark).isEmpty()
    monkeypatch.setattr(dedup, "_NGRAM_VOCAB_CAP", 3)
    with pytest.raises(RuntimeError, match="vocabulary cap"):
        dedup.dedup_ngram_jaccard(spark, sf_dir)
    assert _cache_manager(spark).isEmpty(), (
        "vocab-cap trip leaked the persisted gram frame"
    )


def test_empty_gram_universe_returns_typed_empty(spark, tmp_path):
    # Every text is shorter than one trigram after the length>=3 filter,
    # so the gram universe is empty: the operator must return an empty
    # frame with the output schema, not die in groupBy().agg(*[]).
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["ab", "x", ""]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["web"] * 3),
            "n_chars": pa.array([2, 1, 0], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))
    out = dedup.dedup_ngram_jaccard(spark, str(tmp_path))
    assert [f.name for f in out.schema.fields] == ["doc_a", "doc_b", "jacc"]
    assert out.count() == 0
    assert _cache_manager(spark).isEmpty(), (
        "empty-universe early return leaked the persisted gram frame"
    )


def test_stage_events_refuses_source_dir(spark, sf_dir):
    with pytest.raises(ValueError, match="must not be the source"):
        stream_fuzz.stage_events(spark, sf_dir, sf_dir)


def test_stage_events_preserves_unrelated_files(spark, sf_dir, tmp_path):
    work = str(tmp_path)
    stream_fuzz.stage_events(spark, sf_dir, work, n_files=2)
    bystander = os.path.join(work, "unrelated.txt")
    with open(bystander, "w") as fh:
        fh.write("keep me")
    # Force a re-stage by invalidating the fingerprint (different split
    # count) — the wipe must only touch events_*.parquet and _staged.
    stream_fuzz.stage_events(spark, sf_dir, work, n_files=3)
    assert os.path.exists(bystander)
    assert open(bystander).read() == "keep me"
    staged = sorted(
        f for f in os.listdir(work)
        if f.startswith("events_") and f.endswith(".parquet")
    )
    assert staged == ["events_0.parquet", "events_1.parquet", "events_2.parquet"]
