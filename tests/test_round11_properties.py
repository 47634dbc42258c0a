"""Invariant (property) tests for the round-11 operators — algebraic
identities the oracle equality can't distinguish from coincidence:

- CUSUM: the scaled deviations telescope to EXACTLY zero per user
  (sum of n*v_t - total over all t == n*total - n*total), D_t >= 0,
  and D_t == S_t - running-min identity.
- ABC/Pareto: classes partition by construction, the final cumulative
  share is exactly 1.0 (the BIGINT running sum ends at the grand
  total), class thresholds are consistent with cum_share.
- MAD: mad >= 0; at least half the user's days sit at or below med +
  interpolation (median contract); anomaly implies adev > 3*mad.
- Range search: every reported pair clears the threshold, and the
  result set equals the brute-force threshold filter computed
  independently (prune losslessness, checked in-engine rather than
  cross-engine).
- VAD: n_active_frames == sum of segment runs >= max_run, segments are
  maximal (count <= ceil(frames/2) for 4-frame clips -> <= 2).
- Epoch schedule: sampled_toks <= target_toks and epochs_q2 <= cap;
  sampled_toks == tok_total*epochs_q2 DIV 100 exactly.
"""

from __future__ import annotations

import math

from spark_sql_flow_plugin_spark.registry import queries


def test_cusum_telescoping_and_nonnegative(spark, sf_dir):
    rows = queries()["events_cusum_drift"](spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
        assert r.d_t >= 0
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r.day)
        # the mean-centered scaled deviations telescope to exactly zero
        assert rs[-1].s_t == 0, f"user {uid}: final prefix sum {rs[-1].s_t}"
        # D_t == S_t - min(S_1..t), recomputed independently
        run_min = None
        for r in rs:
            run_min = r.s_t if run_min is None else min(run_min, r.s_t)
            assert r.d_t == r.s_t - run_min


def test_abc_pareto_partition_and_final_share(spark, sf_dir):
    rows = queries()["orders_abc_pareto"](spark, sf_dir).collect()
    assert rows
    shares = sorted(r.cum_share for r in rows)
    assert shares[-1] == 1.0  # exact: BIGINT running sum ends at grand
    for r in rows:
        assert r.abc_class in ("A", "B", "C")
        if r.abc_class == "A":
            assert r.cum_share <= 0.8 + 1e-12
        elif r.abc_class == "C":
            assert r.cum_share > 0.95 - 1e-12
    # revenue-ordered prefix property: every A item's revenue >= every
    # C item's revenue (classes are contiguous in the ranking)
    min_a = min((r.rev_cents for r in rows if r.abc_class == "A"), default=None)
    max_c = max((r.rev_cents for r in rows if r.abc_class == "C"), default=None)
    if min_a is not None and max_c is not None:
        assert min_a >= max_c


def test_mad_median_contracts(spark, sf_dir):
    rows = queries()["events_anomaly_mad"](spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        assert r.mad >= 0
        if r.is_anomaly:
            assert abs(r.v_cents - r.med) > 3 * r.mad
        by_user.setdefault(r.user_id, []).append(r)
    for uid, rs in by_user.items():
        med = rs[0].med
        n = len(rs)
        at_or_below = sum(1 for r in rs if r.v_cents <= med)
        assert at_or_below >= n // 2, f"user {uid}: median contract broken"


def test_range_search_equals_bruteforce_threshold(spark, sf_dir):
    from spark_sql_flow_plugin_spark.operators.similarity import (
        _RS_NBLK,
        _RS_TAU,
    )

    got = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in queries()["ann_range_search"](spark, sf_dir).collect()
    }
    # independent brute force in python over the same vectors
    e = {
        r.vec_id: list(r.embedding)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    qs = {k: v for k, v in e.items() if k < _RS_NBLK}
    cs = {k: v for k, v in e.items() if k >= _RS_NBLK}
    want = {}
    for qid, qv in qs.items():
        nq = math.sqrt(sum(float(x) * float(x) for x in qv))
        for nid, cv in cs.items():
            dot = sum(float(a) * float(b) for a, b in zip(qv, cv))
            nc = math.sqrt(sum(float(x) * float(x) for x in cv))
            cos = round(dot / (nq * nc), 6)
            if cos >= _RS_TAU:
                want[(qid, nid)] = cos
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9


def test_vad_run_identities(spark, sf_dir):
    rows = queries()["multimodal_audio_vad"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.max_run <= r.n_active_frames <= 4
        if r.n_segments == 0:
            assert r.n_active_frames == 0 and r.max_run == 0
        else:
            # maximal segments: k segments need >= k actives and, for
            # k>1, at least one inactive separator between them
            assert r.n_active_frames >= r.n_segments
            assert r.n_segments + r.n_active_frames <= 4 + 1


def test_epoch_schedule_budget_identities(spark, sf_dir):
    from spark_sql_flow_plugin_spark.operators.curation import (
        _EPOCH_CAP_Q2,
    )

    rows = queries()["curation_epoch_schedule"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.epochs_q2 <= _EPOCH_CAP_Q2
        assert r.sampled_toks == r.tok_total * r.epochs_q2 // 100
        # capped domains sample <= cap x their size; uncapped ones
        # land within one integer-division step of the target
        if r.epochs_q2 < _EPOCH_CAP_Q2:
            assert r.sampled_toks <= r.target_toks


def test_incremental_refresh_matches_monolithic(spark, sf_dir):
    # the delta-merge result must equal a directly-computed monolithic
    # aggregate built with the SAME DataFrame ops (in-engine identity,
    # independent of the DuckDB oracle path)
    import pyspark.sql.functions as F

    from spark_sql_flow_plugin_spark.sources import load

    got = {
        (r.month, r.l_returnflag): (r.n_items, r.revenue_cents)
        for r in queries()["incremental_join_agg_refresh"](spark, sf_dir).collect()
    }
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    o = load(spark, sf_dir, "orders")["orders"]
    mono = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate").cast("date"))
            .cast("date")
            .alias("month"),
            "l_returnflag",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .collect()
    )
    want = {(r.month, r.l_returnflag): (r.n_items, r.revenue_cents) for r in mono}
    assert got == want


def test_triangle_counts_match_networkx_free_reference(spark, sf_dir):
    # independent python reference on the same co-purchase edge set
    import duckdb

    rows = {
        r.node: r.n_tri
        for r in queries()["graph_triangle_count"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    edges = con.sql(
        f"""SELECT DISTINCT a.l_partkey AS i, b.l_partkey AS j
        FROM read_parquet('{sf_dir}/lineitem.parquet') a
        JOIN read_parquet('{sf_dir}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"""
    ).fetchall()
    adj: dict = {}
    for i, j in edges:
        adj.setdefault(i, set()).add(j)
    want: dict = {}
    for i, out in adj.items():
        for j in out:
            common = out & adj.get(j, set())
            for k in common:
                for v in (i, j, k):
                    want[v] = want.get(v, 0) + 1
    assert rows == want


def test_containment_detects_planted_excerpts_directionally(spark, sf_dir):
    # the corpus plants 80-char excerpts (excerpt id = -doc_id - 1, a
    # negative id space that can never collide with real doc_ids at any
    # scale factor) of parents — exactly the subset shape Jaccard
    # dilutes; containment must flag them with the excerpt on the SUB
    # side, and scores stay <= 1e6
    rows = queries()["dedup_containment"](spark, sf_dir).collect()
    assert rows
    planted = [
        r for r in rows if r.doc_sub < 0 and r.doc_sup == -r.doc_sub - 1
    ]
    assert planted, "no planted excerpt matched its parent"
    # a majority of detected planted pairs sit at high containment
    assert sum(1 for r in planted if r.containment_q6 >= 900_000) >= len(planted) // 2
    for r in rows:
        assert 0 < r.containment_q6 <= 1_000_000
        assert r.shared_fps <= r.sub_fps
