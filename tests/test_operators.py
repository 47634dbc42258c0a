"""Spot checks on the registry query surface (the full DuckDB-oracle gate is
tools/check_oracle.py; these are fast structural assertions so pytest stays
green without a DuckDB run)."""

import pytest

from spark_sql_flow_plugin_spark.registry import all_specs, oracle_sql, queries


def test_registry_complete():
    specs = all_specs()
    assert len(specs) >= 80
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names"
    # every oracle key has a query
    assert set(oracle_sql()) <= set(queries())


@pytest.mark.parametrize(
    "name,key_cols",
    [
        ("q1_pricing_summary", {"l_returnflag", "sum_qty", "count_order"}),
        ("join_left_semi", {"c_custkey", "c_name"}),
        ("cube_agg", {"l_returnflag", "l_linestatus", "cnt"}),
        ("win_ranking", {"rn", "rnk", "drnk", "tile"}),
        ("dedup_exact", {"keeper", "n_copies"}),
        ("dedup_minhash_lsh", {"doc_a", "doc_b", "jacc"}),
        ("ann_bruteforce_topk", {"query_id", "neighbor_id", "cos_sim", "rnk"}),
        ("text_token_count", {"n_ws_tokens", "n_bpe_tokens", "n_chars"}),
        ("sessionize_gaps", {"user_id", "session_id", "n_events"}),
    ],
)
def test_query_runs(spark, sf_dir, name, key_cols):
    df = queries()[name](spark, sf_dir)
    assert key_cols <= set(df.columns)
    assert df.count() > 0


def test_dedup_finds_planted_duplicates(spark, sf_dir):
    rows = queries()["dedup_exact"](spark, sf_dir).collect()
    assert all(r.n_copies >= 2 for r in rows)
    assert len(rows) > 0  # the planted exact copies are found


def test_minhash_finds_near_duplicates(spark, sf_dir):
    rows = queries()["dedup_minhash_lsh"](spark, sf_dir).collect()
    assert len(rows) > 0
    # planted near-dups pair doc_id with doc_id + 1_000_000 (or exact copies)
    planted = [r for r in rows if r.doc_b - r.doc_a in (1000000, 2000000)]
    assert planted
    assert all(0 < r.jacc <= 1.0 for r in rows)


def test_ann_topk_contains_scaled_twin(spark, sf_dir):
    rows = queries()["dedup_embedding_cosine"](spark, sf_dir).collect()
    twins = [r for r in rows if r.id_b - r.id_a == 100000]
    assert twins and all(abs(t.cos_sim - 1.0) < 1e-5 for t in twins)


def test_pack_bins_two_phase_matches_single_window(spark):
    # multi-chunk correctness of the distributed prefix sum: with a tiny
    # chunk size the chunked computation must reproduce the one-window
    # reference bin assignment exactly, including across chunk boundaries
    # and for doc_id sequences with gaps
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_sql_flow_plugin_spark.operators.curation import _PACK_L, _pack_bins

    rng = random.Random(7)
    rows = []
    doc_id = 0
    for _ in range(400):
        doc_id += rng.randint(1, 9)  # gaps: chunks are NOT uniformly filled
        rows.append((doc_id, f"s{rng.randint(0, 2)}", rng.randint(1, _PACK_L // 2)))
    toks = spark.createDataFrame(rows, "doc_id bigint, source string, n_toks int")

    got = sorted(
        (r.source, r.bin, r.n_toks)
        for r in _pack_bins(toks, chunk_docs=64).collect()
    )

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = sorted(
        (r.source, r.bin, r.n_toks)
        for r in toks.select(
            "source",
            "n_toks",
            F.floor((F.sum("n_toks").over(w) - F.col("n_toks")) / _PACK_L).alias("bin"),
        ).collect()
    )
    assert got == ref


def test_winnow_hot_fingerprint_cap_bounds_pairs(spark):
    # planted boilerplate: one fingerprint shared by 100 docs (df >> cap)
    # must be dropped before the pair join — without the cap it alone
    # would emit ~100²/2 pairs; docs 1 and 2 share two RARE fingerprints
    # and must still pair
    from spark_sql_flow_plugin_spark.operators.dedup import _winnow_pairs

    hot = [(i, 999) for i in range(100)]
    rare = [(1, 7), (2, 7), (1, 8), (2, 8)]
    fps = spark.createDataFrame(hot + rare, "doc_id bigint, f bigint")
    rows = _winnow_pairs(fps, cap=50).collect()
    assert [(r.doc_a, r.doc_b, r.shared_fps) for r in rows] == [(1, 2, 2)]


def test_quality_train_logreg_learns(spark, sf_dir):
    # the trainer must beat the majority-class baseline (a model stuck
    # at all-negative predictions — the symptom of a broken gradient —
    # scores exactly max(n_pos, n-n_pos)/n) and its dominant weight must
    # be on the centered stopword-share feature the label derives from
    row = queries()["quality_train_logreg"](spark, sf_dir).collect()[0]
    majority = max(row.n_pos, row.n_docs - row.n_pos) / row.n_docs
    assert row.train_accuracy > majority
    weights = {f"b{j}": abs(row[f"b{j}"]) for j in range(5)}
    assert max(weights, key=weights.get) == "b3"


def test_exact_substring_spans_planted(spark, tmp_path):
    # docs A and B share one exact 40-char block at different offsets;
    # doc C is unrelated. Expect exactly one maximal span per sharing
    # doc covering the planted block (L=24 windows of the 40-char block
    # all match, merging to the full 40 chars), and no row for C.
    import pyspark.sql.functions as F

    from spark_sql_flow_plugin_spark.operators.dedup import (
        dedup_exact_substring_spans,
    )

    block = "0123456789abcdefghijklmnopqrstuvwxyzABCD"  # 40 chars
    assert len(block) == 40
    a = "xxxxxxxxxx" + block + "y" * 30          # block at pos 11 (1-based)
    b = "z" * 5 + block + "w" * 40               # block at pos 6
    c = "entirely unrelated text " * 4
    df = spark.createDataFrame(
        [(1, a, "s"), (2, b, "s"), (3, c, "s")],
        "doc_id bigint, text string, source string",
    )
    out = tmp_path / "docs"
    df.coalesce(1).write.parquet(str(out / "documents.parquet"))
    rows = {
        r.doc_id: r
        for r in dedup_exact_substring_spans(spark, str(out)).collect()
    }
    assert set(rows) == {1, 2}
    for doc_id, start in ((1, 11), (2, 6)):
        r = rows[doc_id]
        assert r.n_dup_spans == 1
        assert r.dup_chars == 40, (doc_id, r)


# ---------------------------------------------------------------------------
# Round 10 — semantic invariants for the new retrieval/curation operators
# (the oracle matrix proves bit-exactness; these pin the MEANING)
# ---------------------------------------------------------------------------


def test_colbert_maxsim_bounds_and_topk_shape(spark, sf_dir):
    rows = queries()["colbert_maxsim_topk"](spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        # 8 query tokens, each max-cosine in [-1, 1] quantized by 1e6
        assert -8_000_000 <= r.maxsim_q6 <= 8_000_000
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert sorted(x.rnk for x in rs) == [1, 2, 3, 4, 5]
        ranked = sorted(rs, key=lambda x: x.rnk)
        scores = [x.maxsim_q6 for x in ranked]
        assert scores == sorted(scores, reverse=True)


def test_colbert_kernel_matches_sql_form(spark, sf_dir):
    # the Arrow MaxSim kernel must be BIT-equal to the interpreted HOF
    # SQL form it replaced (the form the DuckDB oracle mirrors) — the
    # in-repo differential gate for the r11 kernel conversion
    from spark_sql_flow_plugin_spark.operators.similarity import _li_sql
    from spark_sql_flow_plugin_spark.sources import register_views

    register_views(spark, sf_dir, "embeddings")
    sql_rows = {tuple(r) for r in spark.sql(_li_sql("spark")).collect()}
    kernel_rows = {
        tuple(r) for r in queries()["colbert_maxsim_topk"](spark, sf_dir).collect()
    }
    assert kernel_rows == sql_rows


def test_pq_rerank_candidates_come_from_adc_shortlist(spark, sf_dir):
    from spark_sql_flow_plugin_spark.operators.similarity import (
        _PQ_RERANK_CAND,
        _pq_adc_frame,
    )
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    adc = _pq_adc_frame(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    shortlist = {
        (r.query_id, r.neighbor_id)
        for r in adc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _PQ_RERANK_CAND)
        .collect()
    }
    reranked = queries()["ann_pq_rerank"](spark, sf_dir).collect()
    assert reranked, "rerank produced no rows"
    for r in reranked:
        assert (r.query_id, r.neighbor_id) in shortlist


def test_knn_agreement_invariants(spark, sf_dir):
    rows = queries()["knn_label_agreement"](spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.vec_id not in seen  # one audit row per vector
        seen.add(r.vec_id)
        assert 0 <= r.n_same <= r.n_neighbors <= 5
        if r.n_neighbors == 0:
            assert r.agreement is None and r.suspect is False
        else:
            assert abs(r.agreement - r.n_same / r.n_neighbors) < 1e-15
        if r.suspect:
            assert r.n_neighbors >= 3 and r.agreement < 0.5


def test_dsir_scores_raw_pool_only_and_positive(spark, sf_dir):
    from spark_sql_flow_plugin_spark.operators.curation import _DSIR_TARGET
    from spark_sql_flow_plugin_spark.sources import load

    docs = load(spark, sf_dir, "documents")["documents"]
    target_ids = {
        r.doc_id for r in docs.where(f"source = '{_DSIR_TARGET}'").collect()
    }
    rows = queries()["dsir_importance_weights"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.doc_id not in target_ids  # only the raw pool is scored
        assert r.n_toks >= 1
        assert r.dsir_q6 >= 0  # likelihood ratios are positive
        assert r.avg_q6 == r.dsir_q6 // r.n_toks


def test_domain_mix_temperature_rates_normalize(spark, sf_dir):
    rows = queries()["domain_mix_temperature"](spark, sf_dir).collect()
    assert rows
    total_rate = sum(r.mix_rate for r in rows)
    assert abs(total_rate - 1.0) < 1e-9
    # temperature sampling upweights small domains: the smallest domain's
    # rate must exceed its proportional share, the largest's must trail it
    grand = sum(r.tok_total for r in rows)
    smallest = min(rows, key=lambda r: r.tok_total)
    largest = max(rows, key=lambda r: r.tok_total)
    if smallest.tok_total != largest.tok_total:
        assert smallest.mix_rate > smallest.tok_total / grand
        assert largest.mix_rate < largest.tok_total / grand


def test_market_basket_metrics_consistent(spark, sf_dir):
    rows = queries()["market_basket_lift"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.pair_n >= 5
        assert 0 < r.support <= 1
        assert 0 < r.confidence_a_to_b <= 1
        assert r.lift > 0
        assert r.item_a < r.item_b  # canonical pair order


def test_rfm_segments_partition_customers(spark, sf_dir):
    from spark_sql_flow_plugin_spark.sources import load

    rows = queries()["rfm_segmentation"](spark, sf_dir).collect()
    n_cust = load(spark, sf_dir, "orders")["orders"].select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == n_cust  # a true partition
    for r in rows:
        assert 1 <= r.r <= 4 and 1 <= r.f <= 4 and 1 <= r.m <= 4


def test_rake_phrases_contain_no_stopwords(spark, sf_dir):
    from spark_sql_flow_plugin_spark.operators.text import _STOPWORDS

    rows = queries()["text_rake_keywords"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        words = r.phrase.split(" ")
        assert len(words) == r.n_words
        assert not set(words) & set(_STOPWORDS)
        assert 1 <= r.rnk <= 3


def test_cluster_balanced_sample_respects_budget(spark, sf_dir):
    rows = queries()["sample_cluster_balanced"](spark, sf_dir).collect()
    per_cell = {}
    for r in rows:
        per_cell.setdefault(r.cell, []).append(r)
        assert r.rn <= 20
    for cell, rs in per_cell.items():
        # kept = min(budget, cell size), ranks contiguous from 1
        expected = min(20, rs[0].cell_n)
        assert len(rs) == expected
        assert sorted(x.rn for x in rs) == list(range(1, expected + 1))


def test_twa_bounded_by_group_extremes(spark, sf_dir):
    # a time-weighted average is a convex combination of the group's
    # reading values: it must lie within [min, max] of the cents that
    # carried weight — catches sign/overflow errors in the weighted sum
    import pyspark.sql.functions as F

    from spark_sql_flow_plugin_spark.sources import load

    twa = queries()["events_time_weighted_avg"](spark, sf_dir)
    ev = load(spark, sf_dir, "events")["events"].select(
        "user_id",
        F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date").alias("day"),
        (F.floor(F.col("value") * 100 + 0.5) / 100).alias("v"),
    )
    ext = ev.groupBy("user_id", "day").agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax")
    )
    bad = (
        twa.join(ext, ["user_id", "day"])
        .where((F.col("twa_value") < F.col("vmin") - 1e-9)
               | (F.col("twa_value") > F.col("vmax") + 1e-9))
        .count()
    )
    assert bad == 0


def test_rfm_quartiles_balanced(spark, sf_dir):
    # NTILE(4) over a total order produces quartiles whose sizes differ
    # by at most one — per metric, summed from the segment matrix
    rows = queries()["rfm_segmentation"](spark, sf_dir).collect()
    for metric in ("r", "f", "m"):
        sizes = {}
        for r in rows:
            sizes[r[metric]] = sizes.get(r[metric], 0) + r.n_customers
        assert set(sizes) == {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1, (metric, sizes)


def test_maxsim_permutation_invariance(spark):
    # MaxSim is invariant under permutation of the DOCUMENT's token
    # vectors (the max runs over them) — evaluate the registered score
    # expression on a vector and a token-permuted copy of itself
    import random

    from spark_sql_flow_plugin_spark.operators.similarity import _LI_D, _LI_T

    rng = random.Random(13)
    vec = [rng.uniform(-1, 1) for _ in range(_LI_T * _LI_D)]
    perm = list(range(_LI_T))
    rng.shuffle(perm)
    permuted = [vec[t * _LI_D + i] for t in perm for i in range(_LI_D)]
    df = spark.createDataFrame(
        [(vec, vec), (vec, permuted)], "qe array<double>, ce array<double>"
    )
    dot = (
        f"aggregate(zip_with(slice(qe, qt * {_LI_D} + 1, {_LI_D}),"
        f" slice(ce, dt * {_LI_D} + 1, {_LI_D}), (x, y) -> x * y),"
        f" 0D, (a2, v) -> a2 + v)"
    )
    qn = (
        f"transform(sequence(0, {_LI_T - 1}), tk -> sqrt(aggregate("
        f"zip_with(slice(qe, tk * {_LI_D} + 1, {_LI_D}), slice(qe, tk * {_LI_D} + 1, {_LI_D}),"
        f" (x, y) -> x * y), 0D, (acc, v) -> acc + v)))"
    )
    cn = qn.replace("qe", "ce")
    score = (
        f"aggregate(sequence(0, {_LI_T - 1}), 0L, (acc, qt) -> acc + "
        f"array_max(transform(sequence(0, {_LI_T - 1}), dt -> "
        f"CAST(FLOOR(1e6 * ({dot} / "
        f"(element_at(qn, qt + 1) * element_at(cn, dt + 1)))) AS BIGINT))))"
    )
    import pyspark.sql.functions as F

    scores = [
        r.s
        for r in df.select(F.expr(qn).alias("qn_"), F.expr(cn).alias("cn_"), "qe", "ce")
        .withColumnRenamed("qn_", "qn")
        .withColumnRenamed("cn_", "cn")
        .select(F.expr(score).alias("s"))
        .collect()
    ]
    assert scores[0] == scores[1]
    # self-similarity: every query token's best match is itself — cos 1,
    # which FLOOR-quantizes to 1_000_000 or 999_999 when the IEEE
    # dot/(sqrt*sqrt) self-ratio lands one ulp under 1.0
    assert _LI_T * 999_999 <= scores[0] <= _LI_T * 1_000_000
