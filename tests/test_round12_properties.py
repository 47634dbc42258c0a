"""Round-12 property tests.

Schank & Wagner (2005) degree-ordered triangle counting: the operator's
scale posture on power-law graphs is that orienting each undirected edge
from its lower-(degree, id) endpoint bounds every out-degree — and hence
wedge/intersection work — at O(sqrt |E|), where naive key ordering costs
C(hub_degree, 2) at every hub. These tests hold (a) the star-graph
collapse witness for that claim, (b) triangle-set correctness of the
oriented intersection machinery against a brute-force reference on a
seeded random graph, and (c) orientation soundness (it is a bijection on
the undirected edge set).
"""

import itertools
import random

from pyspark.sql import functions as F

from spark_sql_flow_plugin_spark.operators.graphs import (
    count_wedges,
    orient_edges_by_degree,
    triangle_corners,
)


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(int(i), int(j)) for i, j in edges], "i bigint, j bigint"
    )


def test_degree_orientation_collapses_star_wedges(spark):
    # hub 0 linked to 200 leaves; hub has the LOWEST id, so key ordering
    # (the pre-r12 shape) orients every edge out of the hub and pays
    # C(200, 2) = 19900 wedges; degree ordering points every arc INTO
    # the hub (leaves have degree 1 < 200) and pays ZERO
    star = [(0, leaf) for leaf in range(1, 201)]
    pairs = _pairs_df(spark, star)
    oriented = orient_edges_by_degree(pairs)
    assert count_wedges(oriented).count() == 0
    # the naive key-ordered wedge count on the same star, for contrast
    key_wedges = sum(1 for _ in itertools.combinations(range(1, 201), 2))
    assert key_wedges == 19_900


def test_degree_orientation_bounds_skewed_graph_wedges(spark):
    # power-law-ish graph: one hub wired to every node, plus a sparse
    # random background — the shape crawl link graphs actually have.
    # Key ordering pays >= C(hub_degree, 2); degree ordering's wedge
    # count must come in far under it (the hub's arcs all point INTO it)
    rng = random.Random(12)
    n = 300
    edges = {(0, v) for v in range(1, n)}
    for _ in range(400):
        u, v = rng.randrange(1, n), rng.randrange(1, n)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    pairs = _pairs_df(spark, sorted(edges))
    oriented = orient_edges_by_degree(pairs)
    got = count_wedges(oriented).count()
    hub_cost = (n - 1) * (n - 2) // 2  # what key ordering pays at the hub
    assert got < hub_cost // 20, f"wedges {got} did not collapse vs {hub_cost}"


def test_oriented_triangles_match_bruteforce(spark):
    # seeded Erdos-Renyi-ish graph; triangle multiset from the oriented
    # intersection machinery must equal the brute-force reference
    rng = random.Random(7)
    n = 60
    edges = sorted(
        {
            (min(u, v), max(u, v))
            for u, v in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(500)
            )
            if u != v
        }
    )
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {
        (a, b, c)
        for a in adj
        for b in adj[a]
        if b > a
        for c in adj[a] & adj[b]
        if c > b
    }
    pairs = _pairs_df(spark, edges)
    rows = triangle_corners(orient_edges_by_degree(pairs)).collect()
    got = {tuple(sorted((r.u, r.v, r.w))) for r in rows}
    assert len(rows) == len(got), "a triangle was listed more than once"
    assert got == want


def test_orientation_is_bijection_on_edges(spark):
    # every undirected input edge appears exactly once, as exactly one
    # arc, and dord is strictly the larger packed (degree, id) key
    rng = random.Random(3)
    edges = sorted(
        {
            (min(u, v), max(u, v))
            for u, v in (
                (rng.randrange(40), rng.randrange(40)) for _ in range(200)
            )
            if u != v
        }
    )
    pairs = _pairs_df(spark, edges)
    rows = orient_edges_by_degree(pairs).collect()
    assert len(rows) == len(edges)
    assert {tuple(sorted((r.src, r.dst))) for r in rows} == set(edges)
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    base = 4_294_967_296
    for r in rows:
        assert (deg[r.src], r.src) < (deg[r.dst], r.dst)
        assert r.dord == deg[r.dst] * base + r.dst


# ---------------------------------------------------------------------------
# round-12 operators: kcore / binary-sign rerank / b-bit minhash
# ---------------------------------------------------------------------------


def test_kcore_matches_python_peel_reference(spark, sf_dir):
    # independent reference: load the co-purchase edges in python, derive
    # the identical integer threshold, peel the same fixed rounds
    import duckdb

    from spark_sql_flow_plugin_spark.operators.graphs import _KCORE_ROUNDS
    from spark_sql_flow_plugin_spark.registry import queries as _qs

    got = {
        r.node: r.core_deg
        for r in _qs()["graph_kcore_peel"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    edges = con.sql(
        f"""SELECT DISTINCT a.l_partkey AS i, b.l_partkey AS j
        FROM read_parquet('{sf_dir}/lineitem.parquet') a
        JOIN read_parquet('{sf_dir}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"""
    ).fetchall()

    def degree(es):
        d: dict = {}
        for i, j in es:
            d[i] = d.get(i, 0) + 1
            d[j] = d.get(j, 0) + 1
        return d

    d0 = degree(edges)
    k = (sum(d0.values()) * 3) // (len(d0) * 4)
    es = edges
    for _ in range(_KCORE_ROUNDS):
        d = degree(es)
        keep = {n for n, deg in d.items() if deg >= k}
        es = [(i, j) for i, j in es if i in keep and j in keep]
    want = degree(es)
    assert got == want
    # the peel must actually bite: strictly fewer nodes than the raw graph
    assert 0 < len(got) < len(d0)


def test_binary_rerank_matches_python_reference(spark, sf_dir):
    # full two-stage reference in python over the raw embeddings: sign
    # packing, Hamming shortlist (ties by neighbor_id), exact rerank
    import duckdb

    from spark_sql_flow_plugin_spark.operators.similarity import (
        _BQ_K,
        _BQ_NQ,
        _BQ_SHORTLIST,
    )
    from spark_sql_flow_plugin_spark.registry import queries as _qs

    rows = _qs()["ann_binary_sign_rerank"](spark, sf_dir).collect()
    con = duckdb.connect()
    vecs = {
        v: list(e)
        for v, e in con.sql(
            f"SELECT vec_id, embedding::DOUBLE[] FROM"
            f" read_parquet('{sf_dir}/embeddings.parquet')"
        ).fetchall()
    }
    signs = {v: [1 if x >= 0 else 0 for x in e] for v, e in vecs.items()}

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return round(dot / (na * nb), 6)

    want = []
    for q in range(_BQ_NQ):
        hams = sorted(
            (
                (sum(a != b for a, b in zip(signs[q], signs[c])), c)
                for c in vecs
                if c >= _BQ_NQ
            ),
        )[:_BQ_SHORTLIST]
        rer = sorted(
            ((-cos(vecs[q], vecs[c]), c, h) for h, c in hams)
        )[:_BQ_K]
        for rnk, (negcos, c, h) in enumerate(rer, 1):
            want.append((q, c, h, -negcos, rnk))
    got = sorted(
        (r.query_id, r.neighbor_id, r.hamming, r.cos_sim, r.rnk) for r in rows
    )
    want = sorted(want)
    # discrete fields exact; cosine to near-ulp (python round() is
    # banker's, SQL ROUND is half-up — same doubles, different tie rule)
    assert [(g[0], g[1], g[2], g[4]) for g in got] == [
        (w[0], w[1], w[2], w[4]) for w in want
    ]
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) < 1e-9, (g, w)


def test_bbit_minhash_estimator_invariants(spark, sf_dir):
    # low-bit matches are a superset of full-width matches; estimators
    # are exact integer functions of the counts; planted exact dups
    # (augmented corpus) pin the whole chain at 1e6
    from spark_sql_flow_plugin_spark.registry import queries as _qs

    rows = _qs()["dedup_bbit_minhash"](spark, sf_dir).collect()
    assert rows
    saw_exact_dup = False
    for r in rows:
        assert 0 <= r.m16 <= 16 and 0 <= r.m8 <= 16
        assert r.m8 >= r.m16, "a full-width match must match in low bits"
        assert r.est16_q6 == (1_000_000 * r.m16) // 16
        assert r.est8_q6 == (1_000_000 * max(0, 256 * r.m8 - 16)) // (16 * 255)
        assert 0 <= r.est8_q6 <= 1_000_000
        if r.exact_q6 == 1_000_000:
            saw_exact_dup = True
            assert r.m16 == 16 and r.m8 == 16
            assert r.est16_q6 == 1_000_000 and r.est8_q6 == 1_000_000
    assert saw_exact_dup, "augmented corpus must contain exact-dup pairs"


def test_hits_matches_python_reference(spark, sf_dir):
    # independent python HITS on the same md5-derived link graph: exact
    # integer recursion, compared value-for-value
    import hashlib

    import duckdb

    from spark_sql_flow_plugin_spark.operators.graphs import (
        _FANOUT,
        _HITS_K,
        _SCALE,
    )
    from spark_sql_flow_plugin_spark.registry import queries as _qs

    got = {
        r.doc_id: (r.hub_fp, r.auth_fp)
        for r in _qs()["graph_hits_hubs_authorities"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    ids = [
        r[0]
        for r in con.sql(
            f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    ]
    n = len(ids)
    edges = []
    for d in ids:
        for k in range(1, _FANOUT + 1):
            h32 = int(hashlib.md5(f"{d}:{k}".encode()).hexdigest()[:8], 16)
            dst = h32 % n
            if dst != d:
                edges.append((d, dst))
    h = {d: _SCALE for d in ids}
    a = {}
    for _ in range(_HITS_K):
        a = {d: 0 for d in ids}
        for s, t in edges:
            a[t] += h[s]
        h = {d: 0 for d in ids}
        for s, t in edges:
            h[s] += a[t]
    assert got == {d: (h[d], a[d]) for d in ids}


def test_kneser_ney_matches_python_reference(spark, sf_dir):
    # independent python implementation of the exact integer KN terms
    import re

    import duckdb

    from spark_sql_flow_plugin_spark.registry import queries as _qs

    got = {
        r.doc_id: (r.n_bigrams, r.kn_score_q9)
        for r in _qs()["lm_kneser_ney_score"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    c12: dict = {}
    c1: dict = {}
    occ: dict = {}
    for doc_id, text in docs:
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        if len(toks) < 2:
            continue
        pairs = list(zip(toks, toks[1:]))
        occ[doc_id] = pairs
        for p in pairs:
            c12[p] = c12.get(p, 0) + 1
            c1[p[0]] = c1.get(p[0], 0) + 1
    n1f: dict = {}
    n1b: dict = {}
    for w1, w2 in c12:
        n1f[w1] = n1f.get(w1, 0) + 1
        n1b[w2] = n1b.get(w2, 0) + 1
    nbb = len(c12)
    want = {}
    for doc_id, pairs in occ.items():
        s = 0
        for w1, w2 in pairs:
            t1 = (1_000_000_000 * (4 * c12[(w1, w2)] - 3)) // (4 * c1[w1])
            t2 = (3 * 250_000_000 * n1f[w1] * n1b[w2]) // (c1[w1] * nbb)
            s += t1 + t2
        want[doc_id] = (len(pairs), s)
    assert got == want
    # smoothing sanity: every per-occurrence probability is in (0, 1e9]
    # so per-doc scores are positive and bounded by n_bigrams * 1e9
    for doc_id, (n, s) in got.items():
        assert 0 < s <= n * 1_000_000_000


def test_cdc_chunking_is_offset_invariant(spark):
    # the CDC point: a doc and its copy-with-inserted-prefix must chunk
    # the COMMON content identically once past the splice — fixed-stride
    # chunking would misalign every block after the insertion
    from pyspark.sql import functions as F

    from spark_sql_flow_plugin_spark.operators.dedup import (
        _SPARK_CDC_BND,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green bottles hang on the wall and every sentence here exists "
        "only to give the rolling hash enough content to place several "
        "boundaries in a deterministic content defined way for the test"
    )
    shifted = "INSERTED PREAMBLE OF ODD LENGTH 123! " + base
    df = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id bigint, text string"
    )
    bp = df.select(
        "doc_id",
        F.expr(
            f"concat(array(1L), {_SPARK_CDC_BND},"
            f" array(CAST(length(text) + 1 AS BIGINT)))"
        ).alias("bps"),
        "text",
    )
    rows = bp.select(
        "doc_id",
        F.expr(
            "transform(sequence(1, size(bps) - 1), k -> "
            "substring(text, CAST(element_at(bps, k) AS INT), "
            "CAST(element_at(bps, k + 1) - element_at(bps, k) AS INT)))"
        ).alias("chunks"),
    ).collect()
    chunks = {r.doc_id: r.chunks for r in rows}
    assert len(chunks[1]) >= 3, "fixture must produce several chunks"
    # every base chunk except (possibly) the first — whose left edge is
    # the document start, not a content boundary — reappears verbatim in
    # the shifted doc's chunk set
    missing = [c for c in chunks[1][1:] if c not in set(chunks[2])]
    assert not missing, f"content-defined chunks failed to re-align: {missing}"
