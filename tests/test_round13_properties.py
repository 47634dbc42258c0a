"""Round-13 property tests.

(a) The snapshot-check vacuity gate (r12 verdict item #2): a registry
    query that passes with 0 rows at EVERY committed scale factor is an
    empty-vs-empty agreement that has never compared a value — exactly
    the blind spot that hid `not_exists_subquery` / `not_in_subquery`
    for 12 rounds. `all_sf_vacuous` must reject a synthetic all-SF-empty
    fixture and must NOT flag sparse-at-one-SF entries (TPC-DS at
    sf0.001) or queries added mid-round that appear in fewer logs.

(b) The de-vacuated anti-semantics queries themselves must return a
    strict, non-empty subset at the smallest SF — the regression net for
    anyone retuning those predicates later.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from snapshot_check import all_sf_vacuous  # noqa: E402

from spark_sql_flow_plugin_spark.registry import all_specs  # noqa: E402

_LOG_A = """\
pass  q_ok: rows=12 digest=aaaaaaaaaaaa [0.1s]
pass  q_sparse: rows=0 digest=d41d8cd98f00 (VACUOUS: 0 rows) [0.1s]
pass  q_dead: rows=0 digest=d41d8cd98f00 (VACUOUS: 0 rows) [0.1s]
pass  q_new: rows=0 digest=d41d8cd98f00 (VACUOUS: 0 rows) [0.1s]

4 pass, 0 weak (rows-only), 0 fail / 4; WARNING 3 vacuous empty-result passes
"""

_LOG_B = """\
pass  q_ok: rows=120 digest=bbbbbbbbbbbb [0.1s]
pass  q_sparse: rows=7 digest=cccccccccccc [0.1s]
pass  q_dead: rows=0 digest=d41d8cd98f00 (VACUOUS: 0 rows) [0.1s]

3 pass, 0 weak (rows-only), 0 fail / 3; WARNING 1 vacuous empty-result passes
"""

_LOG_C = """\
pass  q_ok: rows=1200 digest=dddddddddddd [0.1s]
pass  q_sparse: rows=70 digest=eeeeeeeeeeee [0.1s]
pass  q_dead: rows=0 digest=d41d8cd98f00 (VACUOUS: 0 rows) [0.1s]
pass  q_new: rows=5 digest=ffffffffffff [0.1s]

4 pass, 0 weak (rows-only), 0 fail / 4; WARNING 1 vacuous empty-result passes
"""


def test_all_sf_vacuous_rejects_all_sf_empty_fixture():
    # q_dead is 0-row in every log it appears in -> flagged.
    # q_sparse is empty only at the smallest SF -> fine.
    # q_new is absent from LOG_B (added mid-round) and populates in
    # LOG_C -> fine.
    assert all_sf_vacuous([_LOG_A, _LOG_B, _LOG_C]) == ["q_dead"]


def test_all_sf_vacuous_passes_clean_logs():
    assert all_sf_vacuous([_LOG_B.replace("(VACUOUS: 0 rows) ", "")]) == []


def test_all_sf_vacuous_counts_partial_coverage():
    # a query vacuous in the ONLY log that contains it is still dead
    assert all_sf_vacuous([_LOG_A]) == ["q_dead", "q_new", "q_sparse"]


_ANTI = {
    # query name -> (kept rows at sf0.001, total rows of the kept side)
    "not_exists_subquery": ("supplier", 10),
    "not_in_subquery": ("part", 200),
    "join_left_anti": ("customer", 150),
    "except_distinct": ("customer", 150),
}


def test_nfc_variant_duplicates_only_caught_normalized(spark, sf_dir):
    # r12 verdict item #6: the planted NFC/NFD pair (-1,-2) and the
    # NFD+case pair (-5,-6) are byte-DIFFERENT raw strings (raw
    # fingerprints differ) whose normalized fingerprints collide — the
    # dedup-recall hole a raw exact-dedup pass silently misses.
    import hashlib

    from spark_sql_flow_plugin_spark.operators.text import _NFC_PLANT

    texts = dict(_NFC_PLANT)
    rows = {
        r.doc_id: r
        for r in specs()["text_normalize_nfc"]
        .builder(spark, sf_dir)
        .where("doc_id < 0")
        .collect()
    }
    assert set(rows) == {i for i, _ in _NFC_PLANT}
    for a, b in ((-1, -2), (-5, -6)):
        raw_a = hashlib.md5(texts[a].encode()).hexdigest()
        raw_b = hashlib.md5(texts[b].encode()).hexdigest()
        assert raw_a != raw_b, f"({a},{b}): raw strings must differ"
        assert rows[a].fp_norm == rows[b].fp_norm, f"({a},{b}): must collide"
        assert rows[a].n_dups >= 2 and rows[b].n_dups >= 2
    # case-only pair and the non-ASCII singleton
    assert rows[-3].fp_norm == rows[-4].fp_norm and rows[-3].n_dups >= 2
    assert rows[-7].n_dups == 1 and rows[-7].changed is False
    assert rows[-2].changed is True and rows[-2].delta_chars == -2


def specs():
    return {s.name: s for s in all_specs()}


def test_kcore_plan_size_constant_in_rounds(spark, sf_dir):
    # r12 verdict item #3: the persisted unroll re-printed every
    # predecessor subplan at each reference site (3,856 plan lines / 601
    # exchange mentions at K=3, super-linear in K). localCheckpoint
    # truncates lineage per round, so the FINAL plan is just the last
    # degree aggregation over a checkpointed leaf — its size must not
    # grow with K.
    from spark_sql_flow_plugin_spark.operators.graphs import _kcore_peel_frame

    def plan_lines(rounds):
        df = _kcore_peel_frame(spark, sf_dir, rounds)
        return len(
            df._jdf.queryExecution().executedPlan().toString().splitlines()
        )

    k3, k6 = plan_lines(3), plan_lines(6)
    assert k3 < 200, f"K=3 plan is {k3} lines — lineage not truncated"
    assert k6 <= k3 + 20, f"plan grew with K: {k3} lines at K=3, {k6} at K=6"


def test_anti_semantics_gates_are_strict_nonempty_subsets(spark, sf_dir):
    specs = {s.name: s for s in all_specs()}
    for name, (_, total) in _ANTI.items():
        rows = specs[name].builder(spark, sf_dir).count()
        assert 0 < rows < total, (
            f"{name}: {rows} rows at {sf_dir} — the r12 vacuity fix "
            f"requires a strict non-empty subset of the {total}-row side"
        )


def test_label_propagation_matches_python_reference(spark, sf_dir):
    # Exact python re-implementation of the same K-round min-label
    # recurrence over the same md5 link graph: collect the Spark edge
    # list once, run the recurrence in pure python, compare every label
    # and community size bit-for-bit.
    import hashlib
    from collections import defaultdict

    from spark_sql_flow_plugin_spark.operators.graphs import (
        _FANOUT,
        _LP_ROUNDS,
        graph_label_propagation,
    )

    rows = graph_label_propagation(spark, sf_dir).collect()
    n = len(rows)

    adj = defaultdict(set)
    for v in range(n):
        for k in range(1, _FANOUT + 1):
            h = int(hashlib.md5(f"{v}:{k}".encode()).hexdigest()[:8], 16) % n
            if h != v:
                adj[v].add(h)
                adj[h].add(v)
    label = {v: v for v in range(n)}
    for _ in range(_LP_ROUNDS):
        label = {
            v: min([label[v]] + [label[u] for u in adj[v]]) for v in range(n)
        }
    sizes = defaultdict(int)
    for v in range(n):
        sizes[label[v]] += 1

    assert n > 0
    for r in rows:
        assert r.label == label[r.doc_id], (r.doc_id, r.label, label[r.doc_id])
        assert r.community_size == sizes[label[r.doc_id]]
    # the recurrence is monotone: labels never exceed the node id
    assert all(r.label <= r.doc_id for r in rows)
    # propagation actually did something: at least one label moved
    assert any(r.label < r.doc_id for r in rows)


def test_label_propagation_plan_size_constant_in_rounds(spark, sf_dir):
    # Same gate as kcore: localCheckpoint per round keeps the final
    # physical plan size independent of K.
    from spark_sql_flow_plugin_spark.operators.graphs import _lp_frame

    def plan_lines(rounds):
        df = _lp_frame(spark, sf_dir, rounds)
        return len(
            df._jdf.queryExecution().executedPlan().toString().splitlines()
        )

    k4, k8 = plan_lines(4), plan_lines(8)
    assert k4 < 200, f"K=4 plan is {k4} lines — lineage not truncated"
    assert k8 <= k4 + 20, f"plan grew with K: {k4} lines at K=4, {k8} at K=8"


def test_embedding_corr_matches_numpy_reference(spark, sf_dir):
    # Exact int64 re-computation of every moment with numpy on the same
    # 2^14 floor quantization; corr re-derived with the identical IEEE
    # expression tree — every cell must match bit-for-bit.
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from spark_sql_flow_plugin_spark.operators.similarity import (
        _CORR_Q,
        _CORR_TOPK,
        embedding_corr_top_pairs,
    )

    rows = embedding_corr_top_pairs(spark, sf_dir).collect()
    assert len(rows) == _CORR_TOPK

    emb = np.stack(
        pq.read_table(f"{sf_dir}/embeddings.parquet")
        .column("embedding")
        .to_pylist()
    ).astype(np.float64)
    q = np.floor(emb * float(_CORR_Q)).astype(np.int64)
    n, d = q.shape
    # int64 headroom guard promised in the operator docstring: every
    # moment numerator n*Sxy is bounded by n^2 * (2^13)^2 — must sit
    # far inside int64 at the tested SF, else the quantizer bit
    # schedule has to shrink
    assert n * n * (1 << 26) < (1 << 62), "quantizer bits too wide for N"
    # ...and the VALUE-range half of the same headroom argument (r13
    # advice): |q| <= 2^13 only holds while embedding components stay in
    # [-0.5, 0.5]. A driver data regeneration with a wider range would
    # make Spark's non-ANSI BIGINT sums wrap silently while DuckDB's
    # HUGEINT promotion errors on the CAST — pin it here so the overflow
    # analysis cannot be voided without a test failure.
    assert float(np.abs(emb).max()) <= 0.5, (
        "embeddings fixture exceeds [-0.5, 0.5]; retune _CORR_Q bit "
        "schedule before trusting the int64 moment headroom"
    )

    sx = q.sum(axis=0)
    g = q.T @ q  # exact: int64, bounded per the guard above
    best = []
    for i in range(d):
        for j in range(i + 1, d):
            cov_num = n * g[i, j] - sx[i] * sx[j]
            var_i = n * g[i, i] - sx[i] * sx[i]
            var_j = n * g[j, j] - sx[j] * sx[j]
            if var_i > 0 and var_j > 0:
                corr = float(cov_num) / (
                    math.sqrt(float(var_i)) * math.sqrt(float(var_j))
                )
                best.append((i, j, int(cov_num), corr))
    best.sort(key=lambda t: (-abs(t[3]), t[0], t[1]))
    want = {(i, j): (cn, corr) for i, j, cn, corr in best[:_CORR_TOPK]}
    for r in rows:
        assert (r.i, r.j) in want, (r.i, r.j)
        cn, corr = want[(r.i, r.j)]
        assert r.n_rows == n and r.cov_num == cn
        assert r.corr == corr, (r.i, r.j, r.corr, corr)


def test_embedding_corr_plan_row_local_gramian(spark, sf_dir):
    # pair terms must explode row-locally behind a Generate barrier —
    # never a posexplode self-join or a cross of the corpus with itself
    from spark_sql_flow_plugin_spark.operators.similarity import (
        embedding_corr_top_pairs,
    )

    plan = (
        embedding_corr_top_pairs(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Generate explode") >= 2  # barrier + pair stream


def test_shard_shuffle_epochs_invariants(spark, sf_dir):
    from collections import defaultdict

    from spark_sql_flow_plugin_spark.operators.curation import (
        _SHARD_BUCKETS,
        _SHARD_EPOCHS,
        shard_shuffle_epochs,
    )

    rows = shard_shuffle_epochs(spark, sf_dir).collect()
    n_docs = len(rows) // _SHARD_EPOCHS
    assert len(rows) == n_docs * _SHARD_EPOCHS

    # positions within each (epoch, shard) are exactly 1..shard_size
    shards = defaultdict(list)
    for r in rows:
        shards[(r.epoch, r.bucket)].append(r.pos)
    for key, ps in shards.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), key
    # every epoch shards the same doc set, but with a DIFFERENT
    # permutation — the epoch salt must actually change placements
    placement = {
        e: {r.doc_id: (r.bucket, r.pos) for r in rows if r.epoch == e}
        for e in range(_SHARD_EPOCHS)
    }
    assert set(placement[0]) == set(placement[1])
    moved = sum(
        1 for d in placement[0] if placement[0][d] != placement[1][d]
    )
    assert moved > n_docs // 2, f"epoch salt barely reshuffles: {moved}/{n_docs}"
    # reproducibility: a second build is bit-identical (no rand() inside)
    again = {
        (r.epoch, r.doc_id): (r.bucket, r.pos)
        for r in shard_shuffle_epochs(spark, sf_dir).collect()
    }
    assert all(again[(r.epoch, r.doc_id)] == (r.bucket, r.pos) for r in rows)


def test_shard_shuffle_plan_no_global_sort(spark, sf_dir):
    # the rank window is partitioned by (epoch, shard): the plan must
    # exchange at shard grain, never funnel through one partition
    from spark_sql_flow_plugin_spark.operators.curation import (
        shard_shuffle_epochs,
    )

    plan = (
        shard_shuffle_epochs(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(epoch" in plan


def test_skyline_frontier_matches_bruteforce_dominance(spark, sf_dir):
    # exact O(n^2) dominance re-check in python over the same integer
    # metrics: every kept row is non-dominated; every excluded doc is
    # dominated by some kept doc (so the frontier is complete, not just
    # sound); and the two-phase (local shard sweep -> global sweep)
    # result equals the direct definition
    import re

    import pyarrow.parquet as pq

    from spark_sql_flow_plugin_spark.operators.curation import (
        curation_skyline_frontier,
    )

    rows = curation_skyline_frontier(spark, sf_dir).collect()
    got = {(r.doc_id, r.n_tokens, r.n_vocab) for r in rows}
    assert len(got) >= 5

    tbl = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    m = {}
    for rec in tbl:
        t = rec["text"]
        if not t:
            continue
        # Java/RE2 \s is ASCII-only; Python's is Unicode-aware — match
        # the engines' convention (the NFC fixture plants non-ASCII ws)
        toks = [w for w in re.split("[ \t\n\x0b\f\r]+", t.lower()) if w != ""]
        m[rec["doc_id"]] = (len(toks), len(set(toks)))

    def dominated(d, by):
        (t1, v1), (t2, v2) = m[d], m[by]
        return (t2 <= t1 and v2 >= v1) and (t2 < t1 or v2 > v1)

    kept_ids = {r.doc_id for r in rows}
    for r in rows:
        assert (m[r.doc_id][0], m[r.doc_id][1]) == (r.n_tokens, r.n_vocab)
        assert not any(dominated(r.doc_id, o) for o in m if o != r.doc_id)
    for d in m:
        if d not in kept_ids:
            assert any(dominated(d, k) for k in kept_ids), d


def test_skyline_two_phase_plan(spark, sf_dir):
    # phase 1 must sweep INSIDE hash shards (parallel window on the
    # shard key); only the residual-frontier phase may funnel through a
    # single partition
    from spark_sql_flow_plugin_spark.operators.curation import (
        curation_skyline_frontier,
    )

    plan = (
        curation_skyline_frontier(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(shard" in plan
    assert plan.count("Exchange SinglePartition") == 1
    assert "CartesianProduct" not in plan


def test_decay_engagement_matches_python_reference(spark, sf_dir):
    # exact integer re-computation: cents >> (age // half_life) summed
    # per user, against the collected result, bit-for-bit
    import math
    from collections import defaultdict

    import pyarrow.parquet as pq

    from spark_sql_flow_plugin_spark.operators.timeseries import (
        _DECAY_HALF_LIFE_US,
        events_decay_engagement,
    )

    rows = events_decay_engagement(spark, sf_dir).collect()
    tbl = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()

    def to_us(v):
        if isinstance(v, int):  # LONG nanos layout (driver flip-flop)
            return v // 1000
        return int(v.timestamp() * 1_000_000) if hasattr(v, "timestamp") else v

    ts_us = [to_us(v) for v in tbl["ts"]]
    now = max(ts_us)
    score = defaultdict(int)
    cnt = defaultdict(int)
    last = defaultdict(int)
    for u, t, v in zip(tbl["user_id"], ts_us, tbl["value"]):
        cents = max(int(math.floor(v * 100 + 0.5)), 0)
        k = (now - t) // _DECAY_HALF_LIFE_US
        score[u] += cents >> k
        cnt[u] += 1
        last[u] = max(last[u], t)
    assert len(rows) == len(score) > 0
    for r in rows:
        assert (r.decay_score, r.n_events, r.last_seen_us) == (
            score[r.user_id],
            cnt[r.user_id],
            last[r.user_id],
        ), r.user_id
    # decay actually bites: at least one user's score is strictly below
    # their undecayed cents total
    raw = defaultdict(int)
    for u, v in zip(tbl["user_id"], tbl["value"]):
        raw[u] += max(int(math.floor(v * 100 + 0.5)), 0)
    assert any(score[u] < raw[u] for u in score)


def test_rrf_dist_rank_equals_global_row_number(spark, sf_dir):
    # the TeraSort two-phase rank must equal the plain global
    # row_number over (metric DESC, doc_id) for every row and signal
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_sql_flow_plugin_spark.operators.curation import (
        quality_rrf_fusion,
    )
    from spark_sql_flow_plugin_spark.sources import load

    rows = quality_rrf_fusion(spark, sf_dir).collect()
    d = load(spark, sf_dir, "documents")["documents"].where(F.length("text") > 0)
    m = d.select(
        "doc_id",
        F.expr(
            r"CAST(size(filter(split(lower(text), '\\s+'), t -> t != '')) AS BIGINT)"
        ).alias("n_tokens"),
        F.expr(
            r"CAST(size(array_distinct(filter(split(lower(text), '\\s+'),"
            r" t -> t != ''))) AS BIGINT)"
        ).alias("n_vocab"),
        F.expr(
            "CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS BIGINT)"
        ).alias("n_alpha"),
    )
    ref = {}
    for metric, out in (
        ("n_tokens", "r_tokens"),
        ("n_vocab", "r_vocab"),
        ("n_alpha", "r_alpha"),
    ):
        w = Window.orderBy(F.col(metric).desc(), F.col("doc_id").asc())
        for r in m.select("doc_id", F.row_number().over(w).alias("rn")).collect():
            ref[(r.doc_id, out)] = r.rn
    assert len(rows) > 0
    for r in rows:
        for out in ("r_tokens", "r_vocab", "r_alpha"):
            assert getattr(r, out) == ref[(r.doc_id, out)], (r.doc_id, out)


def test_rrf_plan_no_full_data_global_sort(spark, sf_dir):
    # the only SinglePartition exchanges allowed are the value-grain
    # cumulative-offset windows (one per signal, fed by an aggregate);
    # the data-grain windows must be hash-partitioned by metric value,
    # and the offset joins must come back as broadcasts
    from spark_sql_flow_plugin_spark.operators.curation import (
        quality_rrf_fusion,
    )

    plan = (
        quality_rrf_fusion(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange SinglePartition") <= 3
    assert plan.count("BroadcastHashJoin") >= 3
    for metric in ("n_tokens", "n_vocab", "n_alpha"):
        assert f"hashpartitioning({metric}" in plan


def test_bfs_seed_distance_matches_python_reference(spark, sf_dir):
    # exact python BFS over the same md5 digraph: distances within the
    # K-hop horizon must match bit-for-bit; beyond it the sentinel
    import hashlib
    from collections import defaultdict

    from spark_sql_flow_plugin_spark.operators.graphs import (
        _BFS_INF,
        _BFS_ROUNDS,
        _BFS_SEED_MOD,
        _FANOUT,
        graph_bfs_seed_distance,
    )

    rows = graph_bfs_seed_distance(spark, sf_dir).collect()
    n = len(rows)
    out_adj = defaultdict(set)
    for v in range(n):
        for k in range(1, _FANOUT + 1):
            h = int(hashlib.md5(f"{v}:{k}".encode()).hexdigest()[:8], 16) % n
            if h != v:
                out_adj[v].add(h)
    dist = {
        v: (0 if v % _BFS_SEED_MOD == 0 else _BFS_INF) for v in range(n)
    }
    for _ in range(_BFS_ROUNDS):
        nxt = dict(dist)
        for u in range(n):
            for w in out_adj[u]:
                if dist[u] + 1 < nxt[w]:
                    nxt[w] = dist[u] + 1
        dist = nxt
    assert n > 0
    for r in rows:
        assert r.dist == dist[r.doc_id], (r.doc_id, r.dist, dist[r.doc_id])
        assert r.reached == (dist[r.doc_id] < _BFS_INF)
    # the seed set and at least one strictly-positive finite distance
    # both exist (the gate is not vacuously all-seeds or all-INF)
    ds = {r.dist for r in rows}
    assert 0 in ds and any(0 < d < _BFS_INF for d in ds)


def test_calibration_bins_invariants(spark, sf_dir):
    # deciles 0..9, counts sum to the joined corpus, sizes within 1 of
    # each other (exact-rank decile split), and label counts consistent
    from spark_sql_flow_plugin_spark.operators.curation import (
        quality_calibration_bins,
    )
    from spark_sql_flow_plugin_spark.operators.text import (
        quality_gopher_rules,
        quality_model_filter,
    )

    rows = sorted(
        quality_calibration_bins(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(10))
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1
    m = quality_model_filter(spark, sf_dir).select("doc_id")
    g = quality_gopher_rules(spark, sf_dir).select("doc_id")
    assert sum(sizes) == m.join(g, "doc_id").count()
    for r in rows:
        assert 0 <= r.n_label_keep <= r.n_docs
        assert r.label_rate == r.n_label_keep / r.n_docs
    # the audit isn't vacuous: pass rates differ somewhere across bins
    assert len({r.n_label_keep for r in rows}) > 1
